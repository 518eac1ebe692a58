from . import corpus, dedup, multimodal, similarity, temporal, text

__all__ = ["corpus", "dedup", "multimodal", "similarity", "temporal", "text"]
