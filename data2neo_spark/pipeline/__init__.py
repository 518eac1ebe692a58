from .webtext import mention_triples, TERM_DICT

__all__ = ["mention_triples", "TERM_DICT"]
