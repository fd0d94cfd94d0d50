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

from . import vocab

SEED = 42

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


def company_pool() -> list[list[str]]:
    """Deterministic list of canonical-group surface lists (JA orgs with
    variants, plus EN orgs without variants)."""
    groups: list[list[str]] = []
    for st in _STEMS:
        for sec in _SECTORS[:4]:
            groups.append(org_surface_variants(st + sec + "株式会社"))
    for st in _EN_STEMS:
        for sec in _EN_SECTORS[:3]:
            groups.append([f"{st} {sec} Inc"])
    return groups


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


def make_page(page_id: int, seed: int = SEED) -> dict:
    """Pure function (seed, page_id) -> pages row."""
    rng = random.Random((seed << 20) ^ page_id)
    groups = company_pool()
    grp = groups[page_id % len(groups)]
    company = grp[rng.randrange(len(grp))]
    lang = "en" if company[0].isascii() and rng.random() < 0.7 else "ja"

    sentences: list[str] = []
    n_rel = rng.randint(3, 8)
    for _ in range(n_rel):
        pred, ja_tpl, en_tpl = vocab.RELATION_TEMPLATES[
            rng.randrange(len(vocab.RELATION_TEMPLATES))
        ]
        if lang == "ja":
            s = company if rng.random() < 0.4 else rng.choice(_CONCEPTS)
            if pred == "regulated_by":
                o = rng.choice(vocab.LAWS)
            elif pred == "measured_by":
                o = rng.choice(["CO2排出量", "エネルギー消費量", "離職率",
                                "労働災害度数率", "女性管理職比率", "独立取締役比率"])
            else:
                o = rng.choice(_CONCEPTS)
            sentences.append(ja_tpl.format(s=s, o=o))
        else:
            s = company if rng.random() < 0.4 else rng.choice(_EN_ALIASES)
            o = rng.choice(_EN_ALIASES)
            if pred == "regulated_by":
                o = rng.choice(vocab.LAWS)
            sentences.append(en_tpl.format(s=s, o=o))
    # filler + zenkaku digits exercise clean_text
    filler = _FILLER_JA if lang == "ja" else _FILLER_EN
    sentences.insert(rng.randrange(len(sentences) + 1), rng.choice(filler))
    year = rng.choice(["２０２４年", "2024年", "２０２３年"])
    sentences.append(f"{year}のESG活動報告。" if lang == "ja"
                     else f"ESG report {year}.")

    paras = []
    for s in sentences:
        pad = rng.choice(["", "\n\t", "  ", "\n\n\t\t"])
        paras.append(f"<p>{pad}{s}{pad}</p>")
    body = "\n".join(paras)
    html = (
        "<html><head><title>ESG Report</title>"
        "<style>body{font:12px}</style>"
        f"<script>var x = {rng.randrange(1000)}; if (x &lt; 3) x++;</script>"
        "</head><body>\n"
        "<!-- generated report -->\n"
        f"<div class='main'><h1>{company} &amp; ESG</h1>\n{body}\n</div>"
        "</body></html>"
    )
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
        minutes=(page_id * 37) % (60 * 24 * 365)
    )
    return {
        "url": f"https://example.org/esg/{page_id}",
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": None,
        "lang": lang,
    }


def gold_canon_groups() -> list[tuple[str, int]]:
    """(surface, canonical_group_id) ground truth for canonicalization tests."""
    out = []
    for gid, grp in enumerate(company_pool()):
        for s in grp:
            out.append((s, gid))
    return out
