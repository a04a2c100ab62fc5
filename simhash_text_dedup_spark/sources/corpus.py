"""Deterministic synthetic source-code corpus generator.

Produces the exact input table shape mandated by BASELINE.json
``input_hint``: ``documents(repo, path, commit, lang, content)`` — plus a
separate *manifest* of planted duplicate families used by the golden
tests (FIXTURES.md).  Precedent in the reference: the ad-hoc synthetic
generators src/test/java/.../GenerateURLData.java:59-120 and
GenerateURLInfo.java:46-120.

Everything is seeded; same (seed, n_docs) -> byte-identical corpus.

Families (FIXTURES.md):
  F-EXACT-FLOOD  byte-identical content, count > spam threshold
  F-EXACT        byte-identical content, count <= threshold
  F-WS           whitespace-only variants (same tokens -> Hamming 0,
                 different sha256 — "same finger, different bytes")
  F-NEAR         small perturbations calibrated to Hamming 1..3
  F-BORDER       perturbations calibrated to Hamming 4..8 (must NOT
                 pair via SimHash; exercises the MinHash borderline path)
  F-CONTAIN      doc B = doc A embedded in a larger file
  F-CHAIN        A~B, B~C near pairs with A,C farther apart
  F-UNIQ         singletons (negative controls)
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import pandas as pd

from simhash_text_dedup_spark.fingerprint_core import hamming, simhash_one

LANGS = ["python", "java", "c", "go", "js", "md"]
EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js", "md": "md"}

_KEYWORDS = {
    "python": ["def", "return", "if", "else", "for", "in", "import", "class", "self"],
    "java": ["public", "static", "void", "int", "return", "class", "new", "final"],
    "c": ["int", "return", "void", "static", "struct", "char", "const", "sizeof"],
    "go": ["func", "return", "if", "err", "nil", "var", "package", "range"],
    "js": ["function", "return", "const", "let", "var", "if", "else", "new"],
    "md": ["the", "a", "of", "and", "to", "in", "is", "for", "this", "with"],
}


def _ident(rng: random.Random) -> str:
    syll = ["get", "set", "load", "parse", "merge", "sort", "hash", "node",
            "item", "value", "index", "count", "buf", "row", "col", "key",
            "tmp", "ctx", "cfg", "util", "data", "meta", "page", "url"]
    return "_".join(rng.choices(syll, k=rng.randint(1, 3))) + str(rng.randint(0, 99))


def _make_source(rng: random.Random, lang: str, n_lines: int) -> str:
    kw = _KEYWORDS[lang]
    idents = [_ident(rng) for _ in range(max(6, n_lines // 4))]
    lines = []
    if lang == "md":
        for _ in range(n_lines):
            lines.append(" ".join(rng.choices(kw + idents, k=rng.randint(4, 12))))
    else:
        lines.append(f"// module {_ident(rng)}" if lang != "python" else f"# module {_ident(rng)}")
        for _ in range(n_lines):
            a, b, c = rng.choice(idents), rng.choice(idents), rng.choice(idents)
            pattern = rng.randint(0, 4)
            if pattern == 0:
                lines.append(f"{rng.choice(kw)} {a} = {b}({c}, {rng.randint(0, 1000)});")
            elif pattern == 1:
                lines.append(f"{rng.choice(kw)} {a}({b} {c}) {{")
            elif pattern == 2:
                lines.append(f"    {a} = {a} + {b} * {rng.randint(1, 9)};")
            elif pattern == 3:
                lines.append(f"    {rng.choice(kw)} {a}.{b}({c});")
            else:
                lines.append(f"}} // end {a}")
    return "\n".join(lines) + "\n"


def _perturb(rng: random.Random, content: str, n_edits: int) -> str:
    """Replace n_edits random word tokens with fresh identifiers."""
    import re

    tokens = list(re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", content))
    if not tokens:
        return content + " x"
    out = content
    for _ in range(n_edits):
        m = rng.choice(tokens)
        repl = _ident(rng)
        out = out[: m.start()] + repl + out[m.end():]
        tokens = list(re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", out))
    return out


def _calibrated_variant(
    rng: random.Random, content: str, lo: int, hi: int, max_tries: int = 40
) -> str | None:
    """A perturbed copy whose SimHash Hamming distance to `content` lands
    in [lo, hi]. Deterministic given rng state; None if calibration fails."""
    base_fp = simhash_one(content)
    n_edits = 1
    for _ in range(max_tries):
        cand = _perturb(rng, content, n_edits)
        d = hamming(base_fp, simhash_one(cand))
        if lo <= d <= hi:
            return cand
        n_edits = max(1, n_edits + (1 if d < lo else -1))
    return None


@dataclass
class CorpusSpec:
    n_docs: int = 1000
    seed: int = 42
    spam_threshold: int = 5  # lowered for small-scale fixtures (ref: 1000)


def generate_corpus(spec: CorpusSpec) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (documents, manifest).

    documents: repo, path, commit, lang, content   (input_hint shape)
    manifest:  repo, path, commit, family, role    (golden bookkeeping)
    """
    rng = random.Random(spec.seed)
    rows: list[dict] = []
    manifest: list[dict] = []
    serial = 0

    def emit(content: str, lang: str, family: str, role: str) -> None:
        nonlocal serial
        repo = f"org{serial % 7}/repo{serial % 53}"
        pkg = _ident(rng)
        path = f"src/{pkg}/{_ident(rng)}.{EXT[lang]}"
        commit = "%040x" % rng.getrandbits(160)
        rows.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang,
             "content": content}
        )
        manifest.append(
            {"repo": repo, "path": path, "commit": commit, "family": family,
             "role": role}
        )
        serial += 1

    def base_doc(lang: str | None = None, n_lines: int | None = None) -> tuple[str, str]:
        lang = lang or rng.choice(LANGS)
        n_lines = n_lines or rng.randint(30, 120)
        return _make_source(rng, lang, n_lines), lang

    # --- planted families (fixed small count; rest of corpus is singletons)
    fam = 0

    def famname(kind: str) -> str:
        nonlocal fam
        fam += 1
        return f"{kind}-{fam:04d}"

    n_planted_blocks = max(1, spec.n_docs // 100)
    for _ in range(n_planted_blocks):
        # F-EXACT-FLOOD: > spam_threshold byte-identical copies
        c, lang = base_doc()
        name = famname("F-EXACT-FLOOD")
        for i in range(spec.spam_threshold + 3):
            emit(c, lang, name, "flood")

        # F-EXACT: small byte-identical group (under threshold)
        c, lang = base_doc()
        name = famname("F-EXACT")
        for i in range(3):
            emit(c, lang, name, "exact")

        # F-WS: whitespace-only variants — same tokens, same fingerprint
        c, lang = base_doc()
        name = famname("F-WS")
        emit(c, lang, name, "ws-base")
        emit(c.replace("\n", "\n\n").replace("    ", "\t"), lang, name, "ws-var")

        # F-NEAR: calibrated Hamming 1..3
        c, lang = base_doc(n_lines=80)
        name = famname("F-NEAR")
        emit(c, lang, name, "near-base")
        v = _calibrated_variant(rng, c, 1, 3)
        if v is not None:
            emit(v, lang, name, "near-var")

        # F-BORDER: calibrated Hamming 4..8 (not a SimHash pair)
        c, lang = base_doc(n_lines=80)
        name = famname("F-BORDER")
        emit(c, lang, name, "border-base")
        v = _calibrated_variant(rng, c, 4, 8)
        if v is not None:
            emit(v, lang, name, "border-var")

        # F-CONTAIN: B embeds A
        a, lang = base_doc(n_lines=40)
        name = famname("F-CONTAIN")
        emit(a, lang, name, "contain-inner")
        wrapper, _ = base_doc(lang=lang, n_lines=60)
        emit(wrapper + "\n" + a + "\n" + wrapper[: len(wrapper) // 2], lang, name,
             "contain-outer")

        # F-CHAIN: A~B~C
        a, lang = base_doc(n_lines=100)
        name = famname("F-CHAIN")
        b = _calibrated_variant(rng, a, 1, 3)
        if b is not None:
            cch = _calibrated_variant(rng, b, 1, 3)
            emit(a, lang, name, "chain-a")
            emit(b, lang, name, "chain-b")
            if cch is not None:
                emit(cch, lang, name, "chain-c")

    # --- fill to n_docs with singletons
    while serial < spec.n_docs:
        c, lang = base_doc()
        emit(c, lang, "F-UNIQ", "singleton")

    docs = pd.DataFrame(rows)
    man = pd.DataFrame(manifest)
    return docs, man


def _gen_block(args: tuple[int, int, int]) -> tuple[pd.DataFrame, pd.DataFrame]:
    seed, n_docs, spam_threshold = args
    return generate_corpus(CorpusSpec(n_docs=n_docs, seed=seed,
                                      spam_threshold=spam_threshold))


def generate_corpus_parallel(
    spec: CorpusSpec, block_docs: int = 25_000, n_workers: int | None = None
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Block-parallel corpus generation for large bench corpora.

    Each block is an independent deterministic corpus seeded by
    (spec.seed, block index) — same spec -> byte-identical output, but
    NOT the same bytes as the sequential generator (bench corpora cache
    dirs are versioned accordingly).  ~n_workers x faster: calibration
    (SimHash probing per planted variant) dominates generation."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    sizes = []
    left = spec.n_docs
    while left > 0:
        take = min(block_docs, left)
        sizes.append(take)
        left -= take
    args = [
        (spec.seed * 1_000_003 + i, n, spec.spam_threshold)
        for i, n in enumerate(sizes)
    ]
    workers = n_workers or min(len(args), os.cpu_count() or 4)
    if len(args) == 1:
        parts = [_gen_block(args[0])]
    else:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            parts = list(ex.map(_gen_block, args))
    docs = pd.concat([d for d, _ in parts], ignore_index=True)
    man = pd.concat([m for _, m in parts], ignore_index=True)
    return docs, man


def write_corpus(
    out_dir: str, spec: CorpusSpec, parallel: bool | None = None
) -> tuple[str, str]:
    """Write documents.parquet + manifest.parquet under out_dir.
    parallel=None auto-enables block-parallel generation above 50k docs."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    if parallel is None:
        parallel = spec.n_docs > 50_000
    docs, man = (
        generate_corpus_parallel(spec) if parallel else generate_corpus(spec)
    )
    # documents is a DIRECTORY of parquet files (like any production
    # table): Spark gets one real partition per file, so scans and the
    # fingerprint UDF parallelize without an extra repartition shuffle.
    # A single-row-group monolith gives one non-empty byte-range split
    # and silently serializes the whole UDF stage (observed 4x).
    dp = os.path.join(out_dir, "documents.parquet")
    os.makedirs(dp, exist_ok=True)
    files_per = 4096
    for i, c0 in enumerate(range(0, len(docs), files_per)):
        docs.iloc[c0 : c0 + files_per].to_parquet(
            os.path.join(dp, f"part-{i:05d}.parquet"),
            index=False,
            row_group_size=4096,
        )
    mp = os.path.join(out_dir, "manifest.parquet")
    man.to_parquet(mp, index=False, row_group_size=8192)
    return dp, mp
