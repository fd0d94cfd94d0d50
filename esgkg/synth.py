"""Deterministic synthesizer for the Common-Crawl-style ``pages`` table.

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Every page is a pure function of
(seed, page_id) — no wall clock, no global RNG — so the Spark generator
(spark.range(n) → mapInPandas) and the single-node oracle produce identical
bytes for the same ids.

The HTML wrapper injects the noise the extraction kernel must survive:
script/style blocks, comments, nested tags, HTML entities, zenkaku digits,
and \\n\\t runs (exercising the reference clean_text semantics,
/root/reference/scripts/05_text_extraction.py:23-34).
"""

from __future__ import annotations

import datetime
import random
from functools import lru_cache

from . import vocab

SEED = 42

# Page url prefix: url == URL_PREFIX + str(page_id). Kept as a named
# constant so the bench map chain can rebuild the url column in the JVM
# (nlp.widen_linked) instead of shipping it per triple row over Arrow.
URL_PREFIX = "https://example.org/esg/"

# ~1 org per this many pages when the pool scales with corpus size
PAGES_PER_ORG = 100


def default_groups(n_pages: int) -> int:
    """Org-pool size as a function of corpus size (min: the 88-group base
    pool). Round 1 kept the pool fixed, so canonicalization / graph / link-
    prediction stages saturated at ~350 surfaces and became a constant-size
    serial tail that killed the N→4N scaling gate — with the pool growing
    ~1 org per 100 pages, those stages carry data-proportional parallel
    work at bench scale, as they would on a real corpus."""
    # capped at 16384 groups (3-unit stems, name length ≤ 15) so the
    # cross-group edit-distance separation guarantee of `_stem_for` holds
    # at any corpus size
    return min(max(88, n_pages // PAGES_PER_ORG), 16384)

# Katakana stems for company-name generation.
_STEMS = (
    "アクメ", "ミドリ", "サクラ", "ヤマト", "ホシノ", "カゼン", "ツバサ",
    "ハルカ", "ニシキ", "アオバ", "タイヨウ", "シンセイ", "ミライ", "コダマ",
    "フジワラ", "ハヤテ",
)
_SECTORS = ("電力", "商事", "製薬", "重工", "食品", "化学", "運輸", "銀行")

_EN_STEMS = ("Acme", "Verdant", "Northwind", "Stellar", "Harbor", "Summit",
             "Pioneer", "Cascade")
_EN_SECTORS = ("Energy", "Foods", "Chemical", "Logistics", "Capital", "Steel")


def org_surface_variants(base: str) -> list[str]:
    """Surface-form variants of one canonical org name — the ground truth for
    the MinHash-LSH + connected-components canonicalization gate
    (FIXTURES.md §5). Variant 1 inserts a middle dot; variant 2 doubles the
    final stem character. All stay ≥ ~0.5 char-3gram Jaccard to the base."""
    stem, suffix = base[:-4], base[-4:]  # suffix == 株式会社
    v1 = stem[:2] + "・" + stem[2:] + suffix
    v2 = stem + stem[-1] + suffix
    return [base, v1, v2]


# Extension-stem unit alphabet: unit i = _P1[i]+_P2[i]+_P3[i]. The three
# position alphabets are (a) pairwise-distinct within each position, so any
# two units differ in ALL 3 chars, and (b) disjoint from the base-pool stems'
# chars at the same positions — so any two distinct org names in the whole
# pool differ by edit distance ≥ 3 while a name's surface VARIANTS differ by
# only 1 edit. That separation is what lets the canonicalizer's conjunctive
# verify (jaccard ≥ 0.5 AND edit_sim ≥ 0.88) merge variants with zero
# cross-group merges at any pool size.
_P1 = "エオキクケセソチテトナヌネノヒマ"
_P2 = "アエオカキケコサスセソタチテナニ"
_P3 = "クケコシスソタチツナニヌネハヒフ"


_UNITS = tuple(_P1[i] + _P2[i] + _P3[i] for i in range(16))


def _stem_for(k: int) -> str:
    """Unique katakana stem for extension index k: one 3-char unit per
    base-16 digit of k. Two distinct k differ in ≥1 digit, and two distinct
    units differ in all 3 chars, so any two stems are at edit distance ≥ 3
    (different digit counts add ≥3 via length). Pure katakana → always
    inside the extractor's org charclass (kernel._ORG_PAT)."""
    parts = [_UNITS[k % 16]]
    k //= 16
    while k:
        parts.append(_UNITS[k % 16])
        k //= 16
    return "".join(parts)


@lru_cache(maxsize=8)
def company_pool(n_groups: int = 88) -> tuple[tuple[str, ...], ...]:
    """Deterministic tuple of canonical-group surface tuples (JA orgs with
    variants, plus EN orgs without variants). The first 88 groups are the
    fixed base pool; groups beyond that are generated JA orgs with a unique
    (multi-stem, sector) pair each — the pool scales with the corpus via
    `default_groups` so the canon/graph stages see a growing vocabulary."""
    groups: list[tuple[str, ...]] = []
    for st in _STEMS:
        for sec in _SECTORS[:4]:
            groups.append(tuple(org_surface_variants(st + sec + "株式会社")))
    for st in _EN_STEMS:
        for sec in _EN_SECTORS[:3]:
            groups.append((f"{st} {sec} Inc",))
    for gid in range(88, n_groups):
        k = gid - 88
        base = _stem_for(k // 8) + _SECTORS[k % 8] + "株式会社"
        groups.append(tuple(org_surface_variants(base)))
    return tuple(groups[:n_groups])


_CONCEPTS = [c for c, p, _ in vocab.HIERARCHY if p not in ("ROOT",)]
_EN_ALIASES = sorted(k for k in vocab.ALIASES if k.isascii())

_FILLER_JA = (
    "当社は持続可能な社会の実現を目指しています。",
    "2024年度の活動実績を以下に報告します。",
    "ステークホルダーとの対話を重視しています。",
    "中期経営計画に基づき施策を推進しています。",
    "詳細は統合報告書をご覧ください。",
)
_FILLER_EN = (
    "This report summarizes our sustainability activities.",
    "We engage with stakeholders on a regular basis.",
    "Figures are reported on a consolidated basis.",
)


_METRICS = ["CO2排出量", "エネルギー消費量", "離職率",
            "労働災害度数率", "女性管理職比率", "独立取締役比率"]


@lru_cache(maxsize=65536)
def _org_concepts(gid: int) -> tuple[str, ...]:
    """Deterministic per-org concept neighborhood (~1/3 of the dictionary).
    Each org mentions only ITS subset, so org-node degree stays bounded
    (~|subset|) while the number of graph nodes/edges grows linearly with
    the org pool — the shape a real corpus has, and the property that keeps
    the Adamic-Adar triangle join data-proportional instead of quadratic."""
    r = random.Random(0xC0FFEE ^ gid)
    return tuple(sorted(r.sample(_CONCEPTS, 24)))


@lru_cache(maxsize=65536)
def _org_en_aliases(gid: int) -> tuple[str, ...]:
    r = random.Random(0xEA7 ^ gid)
    return tuple(sorted(r.sample(_EN_ALIASES, 16)))


def _rb(grb, n: int) -> int:
    """Exact inline of CPython's ``Random._randbelow_with_getrandbits``
    (random.py, unchanged since 3.2): draw ``bit_length(n)`` bits, reject
    while >= n. ``Random.choice/randrange/randint`` are thin python wrappers
    around this one primitive, so calling it directly on the bound
    ``getrandbits`` consumes the SAME entropy stream in the SAME order —
    byte-identical pages (pytest-asserted against the stock-Random
    composition) minus two python frames per draw (~40% of make_page)."""
    k = n.bit_length()
    r = grb(k)
    while r >= n:
        r = grb(k)
    return r


_YEARS = ("２０２４年", "2024年", "２０２３年")
_PADS = ("", "\n\t", "  ", "\n\n\t\t")


def make_page(page_id: int, seed: int = SEED, n_groups: int = 88) -> dict:
    """Pure function (seed, page_id, n_groups) -> pages row."""
    rng = random.Random((seed << 20) ^ page_id)
    grb = rng.getrandbits
    rnd = rng.random
    groups = company_pool(n_groups)
    gid = page_id % len(groups)
    grp = groups[gid]
    company = grp[_rb(grb, len(grp))]          # rng.randrange(len(grp))
    lang = "en" if company[0].isascii() and rnd() < 0.7 else "ja"
    concepts = _org_concepts(gid)
    en_aliases = _org_en_aliases(gid)
    templates = vocab.RELATION_TEMPLATES
    n_tpl = len(templates)
    laws = vocab.LAWS
    n_laws = len(laws)

    sentences: list[str] = []
    n_rel = 3 + _rb(grb, 6)                    # rng.randint(3, 8)
    for _ in range(n_rel):
        pred, ja_tpl, en_tpl = templates[_rb(grb, n_tpl)]
        if lang == "ja":
            s = company if rnd() < 0.4 else concepts[_rb(grb, 24)]
            if pred == "regulated_by":
                o = laws[_rb(grb, n_laws)]
            elif pred == "measured_by":
                o = _METRICS[_rb(grb, 6)]
            else:
                o = concepts[_rb(grb, 24)]
            sentences.append(ja_tpl.format(s=s, o=o))
        else:
            s = company if rnd() < 0.4 else en_aliases[_rb(grb, 16)]
            o = en_aliases[_rb(grb, 16)]
            if pred == "regulated_by":
                o = laws[_rb(grb, n_laws)]
            sentences.append(en_tpl.format(s=s, o=o))
    # filler + zenkaku digits exercise clean_text (argument order of the
    # original ``insert(randrange(...), choice(...))`` call preserved:
    # position draw first, filler draw second)
    filler = _FILLER_JA if lang == "ja" else _FILLER_EN
    pos = _rb(grb, len(sentences) + 1)
    sentences.insert(pos, filler[_rb(grb, len(filler))])
    year = _YEARS[_rb(grb, 3)]
    sentences.append(f"{year}のESG活動報告。" if lang == "ja"
                     else f"ESG report {year}.")

    paras = []
    for s in sentences:
        pad = _PADS[_rb(grb, 4)]
        paras.append(f"<p>{pad}{s}{pad}</p>")
    body = "\n".join(paras)
    html = (
        "<html><head><title>ESG Report</title>"
        "<style>body{font:12px}</style>"
        f"<script>var x = {_rb(grb, 1000)}; if (x &lt; 3) x++;</script>"
        "</head><body>\n"
        "<!-- generated report -->\n"
        f"<div class='main'><h1>{company} &amp; ESG</h1>\n{body}\n</div>"
        "</body></html>"
    )
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
        minutes=(page_id * 37) % (60 * 24 * 365)
    )
    return {
        "url": f"{URL_PREFIX}{page_id}",
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": None,
        "lang": lang,
    }


def gold_canon_groups(n_groups: int = 88) -> list[tuple[str, int]]:
    """(surface, canonical_group_id) ground truth for canonicalization tests."""
    out = []
    for gid, grp in enumerate(company_pool(n_groups)):
        for s in grp:
            out.append((s, gid))
    return out
