"""ESG concept vocabulary, keyword lists, and relation templates.

The seed hierarchy reproduces the reference's concept tree
(/root/reference/src/knowledge_graph/ontology.py:16-34) and base-concept
lists (/root/reference/scripts/06_ontology_construction.py:79-92), extended
GRI/SASB/TCFD-style per the build target.  The keyword lists are the exact
category predicates of /root/reference/scripts/05_text_extraction.py:54-69.
The relation vocabulary is the closed enum of ontology.py:37-43 plus
``instance_of`` (ontology.py:110), ``related_to`` (scripts/06:113) and
``contributes_to`` (scripts/02:64-66).

Everything here is a plain, deterministic Python constant so the single-node
oracle (esgkg/oracle.py) and the Spark pipeline share one source of truth.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Relation vocabulary (closed enum)
# ---------------------------------------------------------------------------

RELATIONS = (
    "is_a",
    "part_of",
    "affects",
    "measured_by",
    "regulated_by",
    "instance_of",
    "related_to",
    "contributes_to",
)

# ---------------------------------------------------------------------------
# Concept hierarchy: (concept, parent, relation)
# Reference seed (ontology.py:16-34) + base concepts (scripts/06:79-92),
# extended with GRI/SASB/TCFD-style topics.
# ---------------------------------------------------------------------------

HIERARCHY: list[tuple[str, str, str]] = [
    ("ESG", "ROOT", "is_a"),
    ("Organization", "ROOT", "is_a"),
    ("Environment", "ESG", "is_a"),
    ("Social", "ESG", "is_a"),
    ("Governance", "ESG", "is_a"),
    # --- Environment -------------------------------------------------------
    ("気候変動", "Environment", "is_a"),
    ("資源効率", "Environment", "is_a"),
    ("生物多様性", "Environment", "is_a"),
    ("汚染防止", "Environment", "is_a"),
    ("水資源", "Environment", "is_a"),
    ("環境マネジメント", "Environment", "is_a"),
    ("温室効果ガス", "気候変動", "is_a"),
    ("カーボンニュートラル", "気候変動", "is_a"),
    ("排出量取引", "気候変動", "is_a"),
    ("気候関連リスク", "気候変動", "is_a"),
    ("再生可能エネルギー", "資源効率", "is_a"),
    ("廃棄物管理", "資源効率", "is_a"),
    ("省エネルギー", "資源効率", "is_a"),
    ("リサイクル", "資源効率", "is_a"),
    ("生態系保護", "生物多様性", "is_a"),
    ("自然資本", "生物多様性", "is_a"),
    ("大気汚染", "汚染防止", "is_a"),
    ("化学物質管理", "汚染防止", "is_a"),
    ("水使用量", "水資源", "is_a"),
    ("排水管理", "水資源", "is_a"),
    ("CO2排出量", "温室効果ガス", "part_of"),
    ("エネルギー消費量", "省エネルギー", "part_of"),
    # --- Social ------------------------------------------------------------
    ("人権", "Social", "is_a"),
    ("労働安全", "Social", "is_a"),
    ("地域社会", "Social", "is_a"),
    ("ダイバーシティ", "Social", "is_a"),
    ("人材開発", "Social", "is_a"),
    ("製品責任", "Social", "is_a"),
    ("労働権", "人権", "is_a"),
    ("児童労働防止", "人権", "is_a"),
    ("強制労働防止", "人権", "is_a"),
    ("労働環境", "労働安全", "is_a"),
    ("健康管理", "労働安全", "is_a"),
    ("労働災害度数率", "労働安全", "part_of"),
    ("コミュニティ貢献", "地域社会", "is_a"),
    ("社会的包摂", "地域社会", "is_a"),
    ("女性活躍", "ダイバーシティ", "is_a"),
    ("障がい者雇用", "ダイバーシティ", "is_a"),
    ("女性管理職比率", "ダイバーシティ", "part_of"),
    ("人材育成", "人材開発", "is_a"),
    ("従業員エンゲージメント", "人材開発", "is_a"),
    ("離職率", "人材開発", "part_of"),
    ("製品安全", "製品責任", "is_a"),
    ("情報セキュリティ", "製品責任", "is_a"),
    ("サプライチェーン", "Social", "is_a"),
    ("サプライヤー監査", "サプライチェーン", "is_a"),
    # --- Governance --------------------------------------------------------
    ("企業統治", "Governance", "is_a"),
    ("リスク管理", "Governance", "is_a"),
    ("情報開示", "Governance", "is_a"),
    ("コンプライアンス体制", "Governance", "is_a"),
    ("取締役会", "企業統治", "is_a"),
    ("株主権利", "企業統治", "is_a"),
    ("役員報酬", "企業統治", "is_a"),
    ("独立取締役比率", "企業統治", "part_of"),
    ("内部統制", "リスク管理", "is_a"),
    ("コンプライアンス", "リスク管理", "is_a"),
    ("危機管理", "リスク管理", "is_a"),
    ("透明性", "情報開示", "is_a"),
    ("ESG情報開示", "情報開示", "is_a"),
    ("監査委員会", "コンプライアンス体制", "is_a"),
    ("腐敗防止", "コンプライアンス体制", "is_a"),
    ("税務透明性", "コンプライアンス体制", "is_a"),
]

# Laws (labelled LAW by the extractor; used as regulated_by objects)
LAWS: tuple[str, ...] = (
    "省エネ法",
    "労働基準法",
    "会社法",
    "金融商品取引法",
    "地球温暖化対策推進法",
    "個人情報保護法",
)

# Alias surface form -> canonical concept (linking dictionary).
ALIASES: dict[str, str] = {
    "GHG": "温室効果ガス",
    "greenhouse gas": "温室効果ガス",
    "温室効果ガス排出": "温室効果ガス",
    "carbon neutrality": "カーボンニュートラル",
    "脱炭素": "カーボンニュートラル",
    "climate change": "気候変動",
    "気候変動問題": "気候変動",
    "renewable energy": "再生可能エネルギー",
    "再エネ": "再生可能エネルギー",
    "waste management": "廃棄物管理",
    "biodiversity": "生物多様性",
    "energy efficiency": "省エネルギー",
    "recycling": "リサイクル",
    "human rights": "人権",
    "labor rights": "労働権",
    "child labor prevention": "児童労働防止",
    "occupational safety": "労働安全",
    "diversity": "ダイバーシティ",
    "women empowerment": "女性活躍",
    "community contribution": "コミュニティ貢献",
    "supply chain": "サプライチェーン",
    "product safety": "製品安全",
    "information security": "情報セキュリティ",
    "corporate governance": "企業統治",
    "board of directors": "取締役会",
    "shareholder rights": "株主権利",
    "internal control": "内部統制",
    "compliance": "コンプライアンス",
    "risk management": "リスク管理",
    "transparency": "透明性",
    "ESG disclosure": "ESG情報開示",
    "audit committee": "監査委員会",
    "anti-corruption": "腐敗防止",
    "executive compensation": "役員報酬",
    "CO2 emissions": "CO2排出量",
    "energy consumption": "エネルギー消費量",
    "employee engagement": "従業員エンゲージメント",
    "turnover rate": "離職率",
    "talent development": "人材育成",
    "natural capital": "自然資本",
    "ecosystem protection": "生態系保護",
    "air pollution": "大気汚染",
    "water usage": "水使用量",
}

# ---------------------------------------------------------------------------
# Category keyword predicates — exact reference lists
# (/root/reference/scripts/05_text_extraction.py:54-69)
# ---------------------------------------------------------------------------

ENV_KEYWORDS = (
    "環境", "気候変動", "カーボンニュートラル", "温室効果ガス",
    "再生可能エネルギー", "廃棄物", "リサイクル", "生物多様性",
)
SOCIAL_KEYWORDS = (
    "人権", "労働", "安全衛生", "ダイバーシティ", "地域社会",
    "サプライチェーン", "製品安全", "情報セキュリティ",
)
GOV_KEYWORDS = (
    "コーポレートガバナンス", "内部統制", "コンプライアンス",
    "リスク管理", "取締役会", "監査", "株主",
)
CATEGORY_KEYWORDS: dict[str, tuple[str, ...]] = {
    "Environment": ENV_KEYWORDS,
    "Social": SOCIAL_KEYWORDS,
    "Governance": GOV_KEYWORDS,
}

# ---------------------------------------------------------------------------
# Relation templates — one source of truth shared by the synthesizer
# (which renders them) and the extractor kernel (which parses them).
# `{s}`/`{o}` are entity slots. The pattern fragments are inserted between
# entity alternations when the kernel compiles its relation regexes.
# ---------------------------------------------------------------------------

# (pred, ja_template, en_template)
RELATION_TEMPLATES: list[tuple[str, str, str]] = [
    ("affects", "{s}は{o}に影響を与えます。", "{s} affects {o}."),
    ("part_of", "{s}は{o}の一部です。", "{s} is part of {o}."),
    ("measured_by", "{s}は{o}によって測定されます。", "{s} is measured by {o}."),
    ("regulated_by", "{s}は{o}によって規制されています。", "{s} is regulated by {o}."),
    ("contributes_to", "{s}は{o}に貢献します。", "{s} contributes to {o}."),
    ("related_to", "{s}は{o}と関連しています。", "{s} is related to {o}."),
]

# Instance-label routing: these NER labels become Instance nodes
# (/root/reference/scripts/06_ontology_construction.py:42-47).
INSTANCE_LABELS = ("ORG", "PRODUCT", "EVENT", "LAW")


def concept_category() -> dict[str, str]:
    """Closure over HIERARCHY: concept -> top E/S/G category (or 'Other').

    Fixes the reference's depth-limited membership test
    (/root/reference/src/knowledge_graph/neo4j_manager.py:118-126, which only
    checked the 2nd level so leaves were misfiled as 'Other' — documented
    divergence per SURVEY.md S8).
    """
    parent = {c: p for c, p, _ in HIERARCHY}
    cats = {"Environment", "Social", "Governance"}
    out: dict[str, str] = {}
    for concept, _, _ in HIERARCHY:
        cur = concept
        seen = set()
        while cur not in cats and cur in parent and cur not in seen:
            seen.add(cur)
            cur = parent[cur]
        out[concept] = cur if cur in cats else "Other"
    for law in LAWS:
        out[law] = "Governance"
    return out


def all_concept_surfaces() -> dict[str, str]:
    """surface form -> canonical concept, for dictionary NER + linking."""
    out = {c: c for c, _, _ in HIERARCHY if c not in ("ROOT",)}
    for law in LAWS:
        out[law] = law
    out.update(ALIASES)
    return out
