"""Language identification: script detection + stopword-profile argmax.

The reference bundles the cybozu langdetect n-gram classifier with 53
language profiles (com/cybozu/labs/langdetect/Detector.java +
src/main/resources/com/cybozu/labs/langdetect/profiles, SURVEY.md §2.8
F10).  This is the JVM-side, oracle-checkable analog: round 5 closed
the profile gap — every one of the reference's 53 codes (af ar bg bn
cs da de el en es et fa fi fr gu he hi hr hu id it ja kn ko lt lv mk
ml mr ne nl no pa pl pt ro ru sk sl so sq sv sw ta te th tl tr uk ur
vi zh-cn zh-tw) is now emitted, plus 7 extra script-unique languages
(si ka hy am my km lo) the block rules give for free.  Three decision
layers, all built-in expressions (no UDF):

1. SCRIPT detection (decisive for 21 block-unique languages): count
   characters in frozen Unicode-block classes via ``regexp_count`` —
   kana is unique to Japanese, hangul to Korean, and Thai/Hebrew/
   Greek + the Indic, SE-Asian, Caucasus and Ethiopic blocks map 1:1.
   A rule fires only when the script has >= SCRIPT_MIN chars AND
   >= 1/SCRIPT_DENSITY of the text's characters, so a stray foreign
   char or a short quoted snippet never flips a document while
   genuinely CJK/Cyrillic/... text (where the script dominates)
   always does.
2. SHARED-SCRIPT splits, four families:
   - Han: traditional-only vs simplified-only marker characters
     (國/国, 會/会, ... — each form never appears in the other
     orthography) → zh-tw when traditional markers outnumber
     simplified, else zh-cn (simplified is the default when a short
     Han string shows no marker either way).
   - Arabic script: Urdu-only letters (ٹ ڈ ڑ ے ں — retroflexes +
     yeh-barree/noon-ghunna, absent from both Arabic and Persian)
     probe first, then the Persian-only letters (پ چ ژ گ — which
     Urdu also uses, hence the order), else ar.
   - Cyrillic: Macedonian-only letters (ѓ ќ ѕ џ љ њ) probe first,
     then Ukrainian-only (і ї є ґ), then a Bulgarian distinctive
     stopword probe (съм/това/защото/... — words Russian doesn't
     share), else ru.
   - Devanagari: Marathi vs Nepali distinctive stopword probes
     (आहे/आणि/यांनी vs छ/छन्/गरेको — Hindi shares neither set);
     whichever counts strictly higher wins, ties (incl. 0-0) → hi.
3. LATIN languages (29): frozen stopword profiles — DISTINCTIVE
   words only, pairwise DISJOINT across profiles (cross-language
   shared stopwords like es/fr 'de' or sv/sk 'som' are deliberately
   absent so the additive argmax separates relatives; da/no split on
   af/efter vs av/etter etc.) (public frequency lists), additive hit
   counts over whitespace tokens, argmax with alphabetical-first
   tie-break via lexicographic struct comparison — 'und' when every
   score is zero.

Everything is integer arithmetic over built-in expressions, with an
exact DuckDB twin (``detect_lang_full_sql``): the regex char classes
use LITERAL range/set characters so Java regex and RE2 see the same
codepoint intervals (parity probed in round 5), and the argmax is
``greatest``/``list_max`` over (score, priority, lang) structs —
identical lexicographic semantics in both engines, priority unique so
the string field never decides.  The rule CHAIN below is the single
priority order; detect_lang and the SQL twin both iterate it, so the
two engines cannot drift.

Plan shape (CLAUDE.md rule 12): the token array is bound ONCE per row
— ``transform`` over a singleton array whose element is the split —
and the Latin argmax plus the bg/mr/ne token probes all read that
bound variable instead of re-splitting the document ~32x.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Latin-script stopword profiles (frozen; public stopword lists;
# pairwise disjoint — asserted in tests/test_langid.py) ---
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "eine", "auf", "für", "werden", "auch", "dem"],
    "en": ["the", "of", "and", "to", "in", "is", "for", "that", "with",
           "this", "have", "are", "not", "from"],
    "es": ["el", "los", "las", "una", "que", "por", "como", "pero",
           "más", "está", "son", "muy", "sobre", "entre"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "qui",
           "pas", "avec", "sur", "mais", "être", "ont"],
    "it": ["il", "di", "che", "per", "con", "sono", "della", "nel",
           "una", "anche", "come", "più", "gli", "alla"],
    "nl": ["de", "het", "een", "van", "dat", "niet", "voor", "met",
           "zijn", "aan", "ook", "maar", "naar", "wordt"],
    "pl": ["nie", "się", "jest", "że", "jak", "ale", "czy", "tak",
           "być", "przez", "tylko", "oraz", "może", "bardzo"],
    "pt": ["os", "um", "uma", "não", "com", "por", "para", "mais",
           "como", "foi", "são", "dos", "ser", "também"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "för", "med",
           "av", "den", "till", "inte", "har"],
    "tr": ["bir", "ve", "bu", "için", "ile", "olarak", "daha", "çok",
           "gibi", "ama", "kadar", "sonra", "değil", "ancak"],
    "cs": ["je", "se", "že", "ale", "jako", "byl", "jsem", "který",
           "jsou", "pro", "není", "této", "když", "také"],
    "da": ["af", "hvad", "hvor", "været", "efter", "også", "kunne",
           "skulle", "hvis", "meget", "uden", "dansk", "ind", "sig"],
    "fi": ["ja", "on", "ei", "että", "oli", "mutta", "hän", "myös",
           "kun", "niin", "kuin", "ovat", "jossa", "sitä"],
    "hu": ["és", "hogy", "nem", "az", "egy", "van", "volt", "mint",
           "csak", "már", "meg", "vagy", "még", "lehet"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
           "ini", "dari", "dalam", "akan", "pada", "juga", "adalah"],
    "no": ["av", "jeg", "fra", "ble", "eller", "når", "etter", "bare",
           "noe", "mer", "både", "norsk", "skal", "vil"],
    "ro": ["și", "este", "nu", "cu", "din", "care", "mai", "pentru",
           "dar", "sunt", "fost", "după", "către", "unde"],
    "vi": ["và", "của", "là", "có", "không", "được", "trong", "người",
           "những", "một", "cho", "này", "với", "đã"],
    # round-5 additions: the reference's remaining 11 Latin profiles
    "af": ["ek", "vir", "baie", "hulle", "gesê", "jou", "hierdie",
           "wees", "altyd", "iemand", "daardie", "geword"],
    "et": ["ning", "või", "kuid", "oma", "selle", "mida", "tema",
           "üks", "ainult", "pärast", "kõik", "ka"],
    "hr": ["koji", "što", "ali", "biti", "kako", "nakon", "između",
           "zbog", "ili", "također", "godine", "svi"],
    "lt": ["ir", "yra", "kaip", "buvo", "bei", "dėl", "jau", "apie",
           "kurie", "metų", "taip", "bet"],
    "lv": ["arī", "tika", "vai", "viņš", "gada", "latvijas", "bija",
           "savu", "pēc", "tas", "šajā", "kura"],
    "sk": ["aj", "alebo", "sú", "bol", "ktorý", "môže", "tiež",
           "podľa", "veľmi", "boli", "ktoré", "túto"],
    "sl": ["tudi", "lahko", "kot", "bilo", "niso", "zaradi", "vendar",
           "ter", "svoje", "bodo", "več", "tega"],
    "so": ["waa", "iyo", "oo", "waxaa", "inuu", "soo", "ayaa", "loo",
           "kala", "wuxuu", "iyada", "halkan"],
    "sq": ["dhe", "për", "një", "është", "nga", "të", "janë", "këtë",
           "shumë", "sipas", "vitin", "kjo"],
    "sw": ["katika", "kwa", "kuwa", "lakini", "wake", "yake", "sana",
           "watu", "pia", "kama", "bila", "wengi"],
    "tl": ["ang", "mga", "ako", "ito", "hindi", "kung", "siya",
           "naman", "lang", "niya", "natin", "ay"],
}
LATIN_ORDER = sorted(LANG_PROFILES)  # tie-break priority: alphabetical
LANG_ORDER = LATIN_ORDER  # kept name for callers of the round-<5 API

# --- token probes for shared-script splits (distinctive words the
# sibling languages don't share; counted over the SAME bound token
# array as the Latin argmax) ---
PROBE_WORDS: dict[str, list[str]] = {
    # Bulgarian vs Russian (both plain Cyrillic; ru is the default)
    "bg": ["съм", "това", "които", "може", "върху", "защото",
           "според", "българия", "след", "чрез"],
    # Marathi vs Nepali vs Hindi (all Devanagari; hi is the default)
    "mr": ["आहे", "आणि", "यांनी", "मध्ये", "केली", "झाली",
           "असून", "त्यांनी"],
    "ne": ["छ", "छन्", "गरेको", "भएको", "लागि", "गर्न",
           "हुन्छ", "रहेको"],
}

# --- script character classes (LITERAL range chars: identical
# codepoint intervals under Java regex and RE2 — see module doc) ---
SCRIPT_PATTERNS: dict[str, str] = {
    "kana": "[ぁ-ヺ]",      # hiragana + katakana
    "han": "[一-鿿]",       # CJK unified ideographs
    "hangul": "[가-힣]",    # hangul syllables
    "thai": "[฀-๿]",
    "deva": "[ऀ-ॿ]",      # devanagari
    "hebrew": "[֐-׿]",
    "arabic": "[؀-ۿ]",
    "greek": "[Ͱ-Ͽ]",
    "cyrillic": "[Ѐ-ӿ]",
    "bengali": "[ঀ-৿]",
    "gurmukhi": "[਀-੿]",   # Punjabi
    "gujarati": "[઀-૿]",
    "tamil": "[஀-௿]",
    "telugu": "[ఀ-౿]",
    "kannada": "[ಀ-೿]",
    "malayalam": "[ഀ-ൿ]",
    "sinhala": "[඀-෿]",
    "georgian": "[Ⴀ-ჿ]",
    "armenian": "[԰-֏]",
    "ethiopic": "[ሀ-፿]",   # Amharic
    "myanmar": "[က-႟]",
    "khmer": "[ក-៿]",
    "lao": "[຀-໿]",
}
# letter-set probes inside a shared script (counted unconditionally,
# consulted only when the owning script rule fires)
UK_MARKERS = "[іїєґ]"        # Ukrainian-only Cyrillic letters
MK_MARKERS = "[ѓќѕџљњ]"      # Macedonian-only Cyrillic letters
FA_MARKERS = "[پچژگ]"        # Persian letters absent from Arabic
UR_MARKERS = "[ٹڈڑےں]"       # Urdu-only letters (absent from ar AND fa)
# Han orthography markers: each character's traditional form never
# appears in simplified text and vice versa
TRAD_MARKERS = "[國會學這們個來時說為點東車馬龍灣處讓裡]"
SIMP_MARKERS = "[国会学这们个来时说为点东车马龙湾处让]"
SCRIPT_MIN = 3      # absolute floor: chars of the script
SCRIPT_DENSITY = 5  # ...and at least 1/5 of all characters
UK_MIN = 2
MK_MIN = 2
FA_MIN = 2
UR_MIN = 2

# The single priority chain (first match wins), shared by detect_lang
# and the DuckDB twin so the engines cannot drift.  "lit" rules map a
# block 1:1; the four composites split a shared script.  kana precedes
# han so Japanese (which mixes kanji + kana) never reads as Chinese.
RULE_CHAIN: list[tuple[str, str, str | None]] = [
    ("lit", "kana", "ja"),
    ("han", "han", None),          # zh-tw / zh-cn marker split
    ("lit", "hangul", "ko"),
    ("lit", "thai", "th"),
    ("deva", "deva", None),        # mr / ne / hi token split
    ("lit", "hebrew", "he"),
    ("lit", "greek", "el"),
    ("lit", "bengali", "bn"),
    ("lit", "gurmukhi", "pa"),
    ("lit", "gujarati", "gu"),
    ("lit", "tamil", "ta"),
    ("lit", "telugu", "te"),
    ("lit", "kannada", "kn"),
    ("lit", "malayalam", "ml"),
    ("lit", "sinhala", "si"),
    ("lit", "georgian", "ka"),
    ("lit", "armenian", "hy"),
    ("lit", "ethiopic", "am"),
    ("lit", "myanmar", "my"),
    ("lit", "khmer", "km"),
    ("lit", "lao", "lo"),
    ("arabic", "arabic", None),    # ur / fa / ar letter split
    ("cyrillic", "cyrillic", None),  # mk / uk / bg / ru split
]
# kept export for round-<5 callers (singleton block rules only)
SCRIPT_RULES: list[tuple[str, str]] = [
    (key, lang) for kind, key, lang in RULE_CHAIN if kind == "lit"
]

ALL_LANGS = (
    [lang for _, lang in SCRIPT_RULES]
    + ["zh-cn", "zh-tw", "hi", "mr", "ne", "ar", "fa", "ur",
       "ru", "uk", "bg", "mk"]
    + LATIN_ORDER
)


def _contains_factory(words: list[str]):
    """Factory, NOT an inline loop closure (CLAUDE.md rule 10 — and
    loop-variable late binding would alias every language's list)."""
    ws = list(words)
    return lambda t: t.isin(ws)


def _latin_best(toks: Column) -> Column:
    """(s, p, lang) struct of the best-scoring Latin language over a
    bound token array; lexicographic greatest == argmax by score with
    alphabetical-first ties (p = reverse rank, unique, so the string
    field never decides)."""
    n = len(LATIN_ORDER)
    entries = [
        F.struct(
            F.size(
                F.filter(toks, _contains_factory(LANG_PROFILES[lang]))
            ).cast("long").alias("s"),
            F.lit(n - i).cast("long").alias("p"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(LATIN_ORDER)
    ]
    return F.greatest(*entries)


def lang_hits(text: Column, lang: str) -> Column:
    """Stopword hit count for one language (kept for the round-<5 API;
    detect_lang no longer calls this per-comparison)."""
    toks = F.split(F.lower(text), " ")
    return F.size(
        F.filter(toks, _contains_factory(LANG_PROFILES[lang]))
    ).cast("bigint")


def detect_lang(text: Column) -> Column:
    """Best language code among ALL_LANGS (60 incl. all 53 reference
    profiles), 'und' when nothing matches.

    RULE_CHAIN first (first match wins, >= SCRIPT_MIN chars at
    >= 1/SCRIPT_DENSITY density), then the Latin stopword argmax.
    Integer-exact; twin: ``detect_lang_full_sql``.

    ASCII fast path: the whole script chain sits under ONE cheap
    ``rlike [^\\x00-\\x7F]`` guard.  Every script pattern and marker
    class is non-ASCII, so pure-ASCII text can never fire a script
    rule — the guard is semantics-free, but CaseWhen codegen
    short-circuits, so the ~30 per-script regex scans are skipped
    for ASCII documents.  On a source-code corpus (the north rule's
    input shape) that is nearly every row, and language ID is the
    CCNet-style FIRST gate, upstream of everything — measured 1.57x
    on the bench code corpus (the always-on Latin stopword argmax
    dominates both paths; BENCH/langid_probe.py, round-5 note in
    BENCH/BASELINE.md)."""
    script = {k: F.regexp_count(text, F.lit(p)) for k, p in SCRIPT_PATTERNS.items()}
    n_chars = F.length(text)
    fires = {
        k: (c >= SCRIPT_MIN) & (c * SCRIPT_DENSITY >= n_chars)
        for k, c in script.items()
    }
    low = F.lower(text)
    uk = F.regexp_count(low, F.lit(UK_MARKERS))
    mk = F.regexp_count(low, F.lit(MK_MARKERS))
    fa = F.regexp_count(text, F.lit(FA_MARKERS))
    ur = F.regexp_count(text, F.lit(UR_MARKERS))
    trad = F.regexp_count(text, F.lit(TRAD_MARKERS))
    simp = F.regexp_count(text, F.lit(SIMP_MARKERS))
    # bind the token array once; the Latin argmax AND the bg/mr/ne
    # probes all reference the bound variable (CLAUDE.md rule 12)
    bound = F.get(
        F.transform(
            F.array(F.split(low, " ")),
            lambda toks: F.struct(
                _latin_best(toks).alias("best"),
                *[
                    F.size(
                        F.filter(toks, _contains_factory(words))
                    ).cast("long").alias(k)
                    for k, words in PROBE_WORDS.items()
                ],
            ),
        ),
        0,
    )
    best = bound["best"]
    composite = {
        "han": F.when(trad > simp, F.lit("zh-tw")).otherwise(F.lit("zh-cn")),
        "deva": (
            F.when(bound["mr"] > bound["ne"], F.lit("mr"))
            .when(bound["ne"] > bound["mr"], F.lit("ne"))
            .otherwise(F.lit("hi"))
        ),
        "arabic": (
            F.when(ur >= UR_MIN, F.lit("ur"))
            .when(fa >= FA_MIN, F.lit("fa"))
            .otherwise(F.lit("ar"))
        ),
        "cyrillic": (
            F.when(mk >= MK_MIN, F.lit("mk"))
            .when(uk >= UK_MIN, F.lit("uk"))
            .when(bound["bg"] >= 1, F.lit("bg"))
            .otherwise(F.lit("ru"))
        ),
    }
    latin = F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))
    expr = latin
    for kind, key, lang in reversed(RULE_CHAIN):
        val = F.lit(lang) if kind == "lit" else composite[key]
        expr = F.when(fires[key], val).otherwise(expr)
    # ASCII guard (see docstring): scripts can only fire on non-ASCII
    return F.when(text.rlike(r"[^\x00-\x7F]"), expr).otherwise(latin)


def detect_lang_full_sql(
    src: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Full SELECT: (id_col, lang_pred) — the exact DuckDB twin of
    detect_lang.  Hit counts, marker counts and script counts are
    computed once in a subquery; the outer CASE iterates the SAME
    RULE_CHAIN, and the Latin argmax is list_max() over the same
    (s, p, lang) structs."""
    def hits(words: list[str]) -> str:
        lst = "[" + ",".join(f"'{w}'" for w in words) + "]"
        return (
            f"len(list_filter(string_split(lower({text_col}), ' '), "
            f"w -> list_contains({lst}, w)))::BIGINT"
        )

    n = len(LATIN_ORDER)
    # list_max over structs == Spark's greatest over the same structs
    # (lexicographic; DuckDB's variadic greatest doesn't bind structs)
    packs = "list_max([" + ", ".join(
        f"struct_pack(s := {hits(LANG_PROFILES[lang])}, "
        f"p := {n - i}::BIGINT, lang := '{lang}')"
        for i, lang in enumerate(LATIN_ORDER)
    ) + "])"
    scripts = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) AS _{key}"
        for key, pat in SCRIPT_PATTERNS.items()
    )
    markers = ", ".join([
        f"len(regexp_extract_all(lower({text_col}), '{UK_MARKERS}')) AS _uk",
        f"len(regexp_extract_all(lower({text_col}), '{MK_MARKERS}')) AS _mk",
        f"len(regexp_extract_all({text_col}, '{FA_MARKERS}')) AS _fa",
        f"len(regexp_extract_all({text_col}, '{UR_MARKERS}')) AS _ur",
        f"len(regexp_extract_all({text_col}, '{TRAD_MARKERS}')) AS _trad",
        f"len(regexp_extract_all({text_col}, '{SIMP_MARKERS}')) AS _simp",
    ])
    probes = ", ".join(
        f"{hits(words)} AS _hits_{k}" for k, words in PROBE_WORDS.items()
    )
    fire = (
        lambda key: f"(_{key} >= {SCRIPT_MIN} "
        f"AND _{key} * {SCRIPT_DENSITY} >= _n)"
    )
    composite = {
        "han": "(CASE WHEN _trad > _simp THEN 'zh-tw' ELSE 'zh-cn' END)",
        "deva": (
            "(CASE WHEN _hits_mr > _hits_ne THEN 'mr' "
            "WHEN _hits_ne > _hits_mr THEN 'ne' ELSE 'hi' END)"
        ),
        "arabic": (
            f"(CASE WHEN _ur >= {UR_MIN} THEN 'ur' "
            f"WHEN _fa >= {FA_MIN} THEN 'fa' ELSE 'ar' END)"
        ),
        "cyrillic": (
            f"(CASE WHEN _mk >= {MK_MIN} THEN 'mk' "
            f"WHEN _uk >= {UK_MIN} THEN 'uk' "
            f"WHEN _hits_bg >= 1 THEN 'bg' ELSE 'ru' END)"
        ),
    }
    whens = " ".join(
        f"WHEN {fire(key)} THEN "
        + (f"'{lang}'" if kind == "lit" else composite[key])
        for kind, key, lang in RULE_CHAIN
    )
    return f"""
        SELECT {id_col},
          CASE
            {whens}
            WHEN struct_extract(_best, 's') > 0
              THEN struct_extract(_best, 'lang')
            ELSE 'und'
          END AS lang_pred
        FROM (
          SELECT {id_col}, {scripts}, length({text_col}) AS _n,
            {markers},
            {probes},
            {packs} AS _best
          FROM {src}
        )
    """


def detect_lang_sql(text_col: str = "text") -> str:  # pragma: no cover
    """Round-<5 expression-style twin is gone (hits are now computed
    once in a subquery); use detect_lang_full_sql."""
    raise NotImplementedError(
        "detect_lang_sql was replaced by detect_lang_full_sql in round 5"
    )
