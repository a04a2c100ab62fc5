"""Measure the language-ID ASCII fast path (functions/langid.py).

Language ID is the CCNet-style FIRST gate of the curation job
(jobs/run_curation.py --lang-id), so its per-doc cost is paid by every
row of the corpus before any other operator runs.  detect_lang guards
the ~30 script/marker regex scans behind one `rlike [^\\x00-\\x7F]`
check; on a source-code corpus (the north rule's input shape) nearly
every document is pure ASCII and skips them all.

The probe measures the SAME expression on the SAME corpus twice:
  - ascii:  the corpus as generated (pure-ASCII code) — fast path
  - forced: each doc with one non-ASCII char appended — slow path
             (script chain runs; text size unchanged to ~1 char)
Evaluation is forced with F.count(lang_pred) per CLAUDE.md rule 8
(count(lit(1)) would let Catalyst prune the projection away).  One
unmeasured warm pass per variant (rule 9), then median of 3.

Usage: python BENCH/langid_probe.py [n_docs]
"""
from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from simhash_text_dedup_spark.session import get_spark
    from simhash_text_dedup_spark.sources.corpus import (
        CorpusSpec,
        generate_corpus,
    )
    from simhash_text_dedup_spark.functions.langid import detect_lang

    spark = get_spark(cores=8)
    pdf, _ = generate_corpus(CorpusSpec(n_docs=n_docs, seed=7))
    docs = spark.createDataFrame(pdf).repartition(32).cache()
    docs.count()  # materialize

    variants = {
        "ascii": F.col("content"),
        "forced": F.concat(F.col("content"), F.lit("é")),
    }
    out: dict[str, dict[str, float]] = {}
    for name, col in variants.items():
        probe = docs.select(detect_lang(col).alias("lang_pred"))
        probe.agg(F.count("lang_pred")).collect()  # warm (rule 9)
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            probe.agg(F.count("lang_pred")).collect()
            walls.append(time.monotonic() - t0)
        med = statistics.median(walls)
        out[name] = {
            "median_s": round(med, 3),
            "docs_per_s": round(n_docs / med),
            "walls": [round(w, 3) for w in walls],
        }
    out["speedup_ascii_vs_forced"] = round(
        out["forced"]["median_s"] / out["ascii"]["median_s"], 2
    )
    print(json.dumps({"n_docs": n_docs, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
