"""Rank-order character-n-gram language identification (Cavnar & Trenkle
1994, "N-Gram-Based Text Categorization") over ~20 Latin-script languages.

Method (the published one, kept exactly SQL-replayable):

* a LANGUAGE PROFILE is the top ``PROFILE_K`` character n-grams
  (n = 1..``NGRAM_MAX``) of a seed text, ranked by frequency (ties →
  lexicographically smaller gram first); seed texts are an embedded
  fixture (simple sentences written for this module — the profiles only
  need the language's character statistics, not literary quality);
* a DOCUMENT PROFILE is built the same way from the document;
* the OUT-OF-PLACE distance between document and language is
  ``sum over doc-profile grams of |doc_rank − lang_rank|``, with a
  ``PROFILE_K`` penalty for grams absent from the language profile;
* the predicted language minimizes (distance, language-code).

Everything is native Column algebra — normalize → n-gram explode → one
(doc, gram) count shuffle → per-doc rank window → broadcast join against
the tiny profile table (~20 × PROFILE_K rows) → one (doc, lang) distance
aggregation. No python in the hot path, and the DuckDB oracle replays the
identical pipeline (profiles inlined as VALUES), so the prediction is
value-hash verified, not spot-checked.

Normalization: lowercase, every non-letter run (unicode ``\\p{L}``,
identical semantics in Java regex and RE2) collapses to ``_``, with a
leading/trailing ``_`` — the classic word-boundary padding.

The reference repo has no language ID; first-class training-pipeline
extension (SURVEY.md §2 additions). Supersedes the 4-language stopword
scorer ``text.with_langid`` (kept as the cheap zero-shuffle baseline).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NGRAM_MAX = 3
PROFILE_K = 40

# Embedded seed texts (fixture data; written for this module).
SEED_TEXTS: Dict[str, str] = {
    "en": ("the quick brown fox jumps over the lazy dog and the weather is "
           "nice today because the sun is shining and the children are "
           "playing in the garden while the mother reads a good book about "
           "the history of the world and the father cooks dinner for the "
           "whole family with fresh bread and cheese"),
    "de": ("der schnelle braune fuchs springt über den faulen hund und das "
           "wetter ist heute schön weil die sonne scheint und die kinder im "
           "garten spielen während die mutter ein gutes buch über die "
           "geschichte der welt liest und der vater das abendessen für die "
           "ganze familie mit frischem brot und käse kocht"),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux et le "
           "temps est beau aujourd'hui parce que le soleil brille et les "
           "enfants jouent dans le jardin pendant que la mère lit un bon "
           "livre sur l'histoire du monde et le père prépare le dîner pour "
           "toute la famille avec du pain frais et du fromage"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y el tiempo "
           "es bueno hoy porque el sol brilla y los niños juegan en el "
           "jardín mientras la madre lee un buen libro sobre la historia del "
           "mundo y el padre cocina la cena para toda la familia con pan "
           "fresco y queso"),
    "it": ("la rapida volpe marrone salta sopra il cane pigro e il tempo è "
           "bello oggi perché il sole splende e i bambini giocano in "
           "giardino mentre la madre legge un buon libro sulla storia del "
           "mondo e il padre cucina la cena per tutta la famiglia con pane "
           "fresco e formaggio"),
    "pt": ("a rápida raposa marrom pula sobre o cão preguiçoso e o tempo "
           "está bom hoje porque o sol brilha e as crianças brincam no "
           "jardim enquanto a mãe lê um bom livro sobre a história do mundo "
           "e o pai cozinha o jantar para toda a família com pão fresco e "
           "queijo"),
    "nl": ("de snelle bruine vos springt over de luie hond en het weer is "
           "vandaag mooi omdat de zon schijnt en de kinderen in de tuin "
           "spelen terwijl de moeder een goed boek over de geschiedenis van "
           "de wereld leest en de vader het avondeten voor het hele gezin "
           "kookt met vers brood en kaas"),
    "sv": ("den snabba bruna räven hoppar över den lata hunden och vädret är "
           "fint idag eftersom solen skiner och barnen leker i trädgården "
           "medan mamman läser en bra bok om världens historia och pappan "
           "lagar middag till hela familjen med färskt bröd och ost"),
    "da": ("den hurtige brune ræv springer over den dovne hund og vejret er "
           "godt i dag fordi solen skinner og børnene leger i haven mens "
           "moren læser en god bog om verdens historie og faren laver "
           "aftensmad til hele familien med frisk brød og ost"),
    "no": ("den raske brune reven hopper over den late hunden og været er "
           "fint i dag fordi solen skinner og barna leker i hagen mens "
           "moren leser en god bok om verdens historie og faren lager "
           "middag til hele familien med ferskt brød og ost"),
    "fi": ("nopea ruskea kettu hyppää laiskan koiran yli ja sää on tänään "
           "kaunis koska aurinko paistaa ja lapset leikkivät puutarhassa "
           "kun äiti lukee hyvää kirjaa maailman historiasta ja isä "
           "valmistaa illallista koko perheelle tuoreen leivän ja juuston "
           "kanssa"),
    "pl": ("szybki brązowy lis skacze przez leniwego psa a pogoda jest "
           "dzisiaj ładna ponieważ świeci słońce a dzieci bawią się w "
           "ogrodzie podczas gdy matka czyta dobrą książkę o historii "
           "świata a ojciec gotuje obiad dla całej rodziny ze świeżym "
           "chlebem i serem"),
    "cs": ("rychlá hnědá liška skáče přes líného psa a počasí je dnes "
           "krásné protože svítí slunce a děti si hrají na zahradě zatímco "
           "matka čte dobrou knihu o historii světa a otec vaří večeři pro "
           "celou rodinu s čerstvým chlebem a sýrem"),
    "sk": ("rýchla hnedá líška skáče cez lenivého psa a počasie je dnes "
           "pekné pretože svieti slnko a deti sa hrajú v záhrade zatiaľ čo "
           "matka číta dobrú knihu o histórii sveta a otec varí večeru pre "
           "celú rodinu s čerstvým chlebom a syrom"),
    "ro": ("vulpea maro rapidă sare peste câinele leneș și vremea este "
           "frumoasă astăzi pentru că soarele strălucește și copiii se "
           "joacă în grădină în timp ce mama citește o carte bună despre "
           "istoria lumii și tatăl gătește cina pentru toată familia cu "
           "pâine proaspătă și brânză"),
    "hu": ("a gyors barna róka átugrik a lusta kutya felett és az idő ma "
           "szép mert süt a nap és a gyerekek a kertben játszanak míg az "
           "anya egy jó könyvet olvas a világ történelméről és az apa "
           "vacsorát főz az egész családnak friss kenyérrel és sajttal"),
    "tr": ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve hava "
           "bugün güzel çünkü güneş parlıyor ve çocuklar bahçede oynuyor "
           "anne dünya tarihi hakkında iyi bir kitap okurken baba bütün "
           "aile için taze ekmek ve peynirle akşam yemeği pişiriyor"),
    "id": ("rubah coklat yang cepat melompati anjing yang malas dan cuaca "
           "hari ini bagus karena matahari bersinar dan anak anak bermain "
           "di kebun sementara ibu membaca buku yang bagus tentang sejarah "
           "dunia dan ayah memasak makan malam untuk seluruh keluarga "
           "dengan roti segar dan keju"),
    "sw": ("mbweha mwepesi wa kahawia anaruka juu ya mbwa mvivu na hali ya "
           "hewa ni nzuri leo kwa sababu jua linawaka na watoto wanacheza "
           "bustanini wakati mama anasoma kitabu kizuri kuhusu historia ya "
           "dunia na baba anapika chakula cha jioni kwa familia nzima na "
           "mkate safi na jibini"),
    "hr": ("brza smeđa lisica skače preko lijenog psa a vrijeme je danas "
           "lijepo jer sunce sija i djeca se igraju u vrtu dok majka čita "
           "dobru knjigu o povijesti svijeta a otac kuha večeru za cijelu "
           "obitelj sa svježim kruhom i sirom"),
    # non-Latin scripts — \p{L} normalization and char n-grams are
    # script-agnostic, so the same method covers them unchanged
    "ru": ("быстрая коричневая лиса прыгает через ленивую собаку и погода "
           "сегодня хорошая потому что светит солнце и дети играют в саду "
           "пока мама читает хорошую книгу об истории мира а папа готовит "
           "ужин для всей семьи со свежим хлебом и сыром"),
    "el": ("η γρήγορη καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί και ο "
           "καιρός είναι ωραίος σήμερα γιατί ο ήλιος λάμπει και τα παιδιά "
           "παίζουν στον κήπο ενώ η μητέρα διαβάζει ένα καλό βιβλίο για την "
           "ιστορία του κόσμου και ο πατέρας μαγειρεύει δείπνο για όλη την "
           "οικογένεια με φρέσκο ψωμί και τυρί"),
    "ar": ("الثعلب البني السريع يقفز فوق الكلب الكسول والطقس جميل اليوم لأن "
           "الشمس مشرقة والأطفال يلعبون في الحديقة بينما تقرأ الأم كتابا "
           "جيدا عن تاريخ العالم ويطبخ الأب العشاء لكل العائلة مع الخبز "
           "الطازج والجبن"),
    "ja": ("すばやい茶色のきつねはなまけたいぬをとびこえます きょうはてんきがよくて "
           "たいようがかがやいています こどもたちはにわであそんでいます ははは "
           "せかいのれきしについてのよいほんをよんでいます ちちはかぞくのために "
           "しんせんなパンとチーズでゆうしょくをつくります"),
    "ko": ("빠른 갈색 여우가 게으른 개를 뛰어넘습니다 오늘은 해가 빛나서 날씨가 "
           "좋습니다 아이들은 정원에서 놀고 있습니다 어머니는 세계의 역사에 관한 "
           "좋은 책을 읽고 아버지는 온 가족을 위해 신선한 빵과 치즈로 저녁을 "
           "만듭니다"),
}


def _normalize_py(text: str) -> str:
    """Python mirror of the Spark/SQL normalization: lowercase, non-letter
    runs → '_', '_'-padded (str.isalpha ≙ \\p{L} on these fixtures)."""
    out: List[str] = []
    for ch in text.lower():
        if ch.isalpha():
            out.append(ch)
        elif not out or out[-1] != "_":
            out.append("_")
    return "_" + "".join(out) + "_"


def profile_of(text: str, k: int = PROFILE_K, n_max: int = NGRAM_MAX,
               max_chars: int = None) -> List[str]:
    """Ranked top-k n-gram profile of a text (pure python — used for the
    fixture profiles and as the in-test reference)."""
    s = _normalize_py(text)
    if max_chars is not None:
        s = s[:max_chars]
    counts: Dict[str, int] = {}
    for n in range(1, n_max + 1):
        for i in range(len(s) - n + 1):
            g = s[i:i + n]
            counts[g] = counts.get(g, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [g for g, _ in ranked[:k]]


@lru_cache(maxsize=1)
def language_profiles() -> Dict[str, List[str]]:
    return {lang: profile_of(t) for lang, t in sorted(SEED_TEXTS.items())}


# the Spark/SQL normalization: lowercase, non-letter runs → '_', padded.
# (\p{L} has identical semantics in Java regex and RE2.)
_NORM_PATTERN = r"[^\p{L}]+"


def _norm_col(text: Column) -> Column:
    return F.concat(
        F.lit("_"), F.regexp_replace(F.lower(text), _NORM_PATTERN, "_"), F.lit("_")
    )


def classify_py(text: str, max_chars: int = 1000) -> Tuple[str, int]:
    """Pure-python reference classifier (tests cross-check Spark against
    this; identical tie-breaking and sample cap, including null input →
    ('und', None) exactly as the Spark path's left join yields)."""
    if text is None:
        return "und", None
    doc = profile_of(text, max_chars=max_chars)
    drank = {g: i + 1 for i, g in enumerate(doc)}
    best = None
    for lang, grams in language_profiles().items():
        lrank = {g: i + 1 for i, g in enumerate(grams)}
        if not any(g in lrank for g in drank):
            continue
        d = sum(
            abs(r - lrank[g]) if g in lrank else PROFILE_K
            for g, r in drank.items()
        )
        cand = (d, lang)
        if best is None or cand < best:
            best = cand
    if best is None:
        return "und", None
    return best[1], best[0]


def with_langid_ct(
    df: DataFrame, id_col: str, text_col: str = "text",
    max_chars: int = 1000,
) -> DataFrame:
    """(id, lang_pred, dist) — Cavnar-Trenkle prediction per document.

    One (doc, gram) count shuffle + one per-doc rank window + a broadcast
    profile join + one (doc, lang) distance aggregation; only documents
    whose profile shares NO gram with any language profile predict 'und'
    (with a NULL dist) — in practice that means null text: empty text
    normalizes to '__', whose '_'/'__' grams match every profile, so
    empty documents get a (meaningless but deterministic) real-language
    prediction. Run after quality gates, which drop empty docs anyway.

    ``max_chars`` caps the normalized sample per document (the published
    method classifies on ~300-byte samples; 1000 normalized chars is
    already top-profile-saturating) — the 100 TB guard: per-doc cost is
    O(max_chars), not O(document length), so a 100 KB crawl page costs
    the same as a tweet. ``None`` disables the cap."""
    spark = df.sparkSession
    prof_rows = [
        (lang, gram, rank + 1)
        for lang, grams in language_profiles().items()
        for rank, gram in enumerate(grams)
    ]
    profiles = spark.createDataFrame(prof_rows, "lang string, gram string, lrank int")

    norm = _norm_col(F.col(text_col))
    if max_chars is not None:
        norm = F.substring(norm, 1, max_chars)
    bound = df.select(F.col(id_col), norm.alias("_s"))
    s = F.col("_s")

    def _gram_array(n: int) -> Column:
        # NOTE: the closure variable must NOT be a lambda default arg —
        # pyspark dispatches transform lambdas on their ARITY, so a
        # two-parameter lambda receives (element, index) and the default
        # is silently shadowed by the array index
        return F.when(
            F.length(s) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(s) - F.lit(n - 1)),
                lambda i: F.substr(s, i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    gram_arrays = [_gram_array(n) for n in range(1, NGRAM_MAX + 1)]
    grams = bound.select(
        F.col(id_col),
        F.explode(F.concat(*gram_arrays)).alias("gram"),
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(id_col).orderBy(F.col("n").desc(), F.col("gram").asc())
    doc_prof = (
        counts.withColumn("drank", F.row_number().over(w))
        .where(F.col("drank") <= PROFILE_K)
        .select(id_col, "gram", "drank")
    )
    # matched-gram adjustment: every doc-profile gram starts at the
    # PROFILE_K out-of-place penalty; a gram found in the language profile
    # replaces it with |drank − lrank| (always smaller, since both ranks
    # are in [1, PROFILE_K]). Unmatched languages therefore can never beat
    # a matched one, so only matched (doc, lang) pairs need aggregating.
    ksize = doc_prof.groupBy(id_col).agg(F.count(F.lit(1)).alias("_k"))
    matched = (
        doc_prof.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.abs(F.col("drank") - F.col("lrank")) - F.lit(PROFILE_K)
            ).alias("_adj")
        )
    )
    best = (
        matched.join(ksize, id_col)
        .withColumn("dist", (F.col("_k") * F.lit(PROFILE_K) + F.col("_adj")).cast("long"))
        .groupBy(id_col)
        .agg(F.min(F.struct(F.col("dist"), F.col("lang"))).alias("_m"))
        .select(id_col, F.col("_m.lang").alias("lang_pred"),
                F.col("_m.dist").alias("dist"))
    )
    return df.select(F.col(id_col)).join(best, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("lang_pred"), F.lit("und")).alias("lang_pred"),
        F.col("dist"),
    )
