"""Cavnar-Trenkle language ID: profile determinism, Spark vs pure-python
reference parity, multilingual accuracy, clean_corpus wiring."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data2neo_spark.operators import langid as L

SENTS = [
    (0, "en", "the children are playing in the garden and the weather is very nice today my friend"),
    (1, "de", "die kinder spielen im garten und das wetter ist heute sehr schön mein freund"),
    (2, "fr", "les enfants jouent dans le jardin et le temps est très beau aujourd'hui mon ami"),
    (3, "es", "los niños juegan en el jardín y el tiempo es muy bueno hoy mi amigo"),
    (4, "nl", "de kinderen spelen in de tuin en het weer is vandaag erg mooi mijn vriend"),
    (5, "pl", "dzieci bawią się w ogrodzie a pogoda jest dzisiaj bardzo ładna mój przyjacielu"),
    (6, "tr", "çocuklar bahçede oynuyor ve hava bugün çok güzel arkadaşım"),
    (7, "it", "la madre legge un buon libro e i bambini giocano in giardino oggi amici"),
    (8, "fi", "lapset leikkivät puutarhassa ja sää on tänään kaunis ystäväni"),
    (9, "pt", "as crianças brincam no jardim e o tempo está muito bom hoje meu amigo"),
]


def test_profiles_deterministic_and_distinct():
    p1 = L.language_profiles()
    p2 = L.language_profiles()
    assert p1 is p2 and len(p1) >= 20
    assert all(len(v) == L.PROFILE_K for v in p1.values())
    # profiles must actually differ between languages
    assert p1["en"] != p1["de"] != p1["fi"]


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame(
        pd.DataFrame(SENTS, columns=["doc_id", "truth", "text"])
    )
    got = {r["doc_id"]: (r["lang_pred"], r["dist"])
           for r in L.with_langid_ct(df, "doc_id").collect()}
    for doc_id, truth, text in SENTS:
        assert got[doc_id] == L.classify_py(text), (doc_id, text)
        assert got[doc_id][0] == truth, (doc_id, got[doc_id])


def test_clean_corpus_ct_langid(spark):
    from data2neo_spark.operators.corpus import clean_corpus

    rows = [(i, t) for i, _l, t in SENTS]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    kept, _report = clean_corpus(
        df, min_words=3, keep_langs=["en", "de"], langid="ct"
    )
    assert {r["doc_id"] for r in kept.collect()} == {0, 1}
    with pytest.raises(ValueError):
        clean_corpus(df, keep_langs=["en"], langid="nope")


def test_sample_cap_bounds_cost_and_stays_exact(spark):
    """max_chars caps the per-doc sample (the published method uses short
    samples): a 100k-char doc classifies from its first 1000 normalized
    chars, Spark == python reference at the same cap."""
    long_text = ("die kinder spielen im garten und das wetter ist schön " * 300)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [long_text]})
    )
    r = L.with_langid_ct(df, "doc_id").collect()[0]
    assert (r["lang_pred"], r["dist"]) == L.classify_py(long_text)
    assert r["lang_pred"] == "de"
    # uncapped agrees here too, just costs O(len)
    r2 = L.with_langid_ct(df, "doc_id", max_chars=None).collect()[0]
    assert r2["lang_pred"] == "de"


def test_non_latin_scripts(spark):
    """\\p{L} normalization + char n-grams are script-agnostic: Cyrillic,
    Greek, Arabic, Japanese, and Korean classify correctly, Spark ==
    python reference."""
    rows = [
        (0, "ru", "дети играют в саду и погода сегодня очень хорошая мой друг"),
        (1, "el", "τα παιδιά παίζουν στον κήπο και ο καιρός είναι πολύ ωραίος σήμερα φίλε μου"),
        (2, "ar", "الأطفال يلعبون في الحديقة والطقس جميل جدا اليوم يا صديقي"),
        (3, "ja", "こどもたちはにわであそんでいます きょうはてんきがとてもいいです"),
        (4, "ko", "아이들은 정원에서 놀고 있고 오늘 날씨가 매우 좋습니다 친구여"),
        (5, "en", "the children are playing in the garden and the weather is very nice today"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "truth", "text"]))
    got = {r["doc_id"]: (r["lang_pred"], r["dist"])
           for r in L.with_langid_ct(df, "doc_id").collect()}
    for i, truth, text in rows:
        assert got[i] == L.classify_py(text), (i, got[i])
        assert got[i][0] == truth, (i, got[i])
