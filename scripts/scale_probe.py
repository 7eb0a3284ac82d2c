"""Scale probe for the near-dup keeper pipeline (j2e shape).

Runs minhash LSH pairing + connected components + keeper decision over
the fixture documents at 1x and 10x (9 replica copies at shifted ids)
and prints one JSON line per scale:

    {"scale": 10, "n_docs": 5000, "n_pairs": ..., "cc_rounds": 2,
     "sec": ...}

The claim under test: CC rounds stay bounded (near-dup graphs are
shallow) and wall-time grows ~linearly in corpus size — i.e. the
banded-bucket candidate generation, not an all-pairs term, dominates.

Usage: python scripts/scale_probe.py [sf_dir] [scales...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.operators.dedup import (
    connected_components,
    dedup_keepers,
    minhash_lsh_pairs,
)
from realtime_cdc_pipeline_docker_spark.session import get_session


def replicate(docs, scale: int):
    corpus = docs
    for r in range(1, scale):
        corpus = corpus.unionByName(
            docs.select((F.col("doc_id") + 1_000_000 * r).alias("doc_id"), "text")
        )
    return corpus


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    scales = [int(s) for s in sys.argv[2:]] or [1, 10]
    spark = get_session(app="scale-probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for scale in scales:
        corpus = replicate(docs, scale).persist()
        n_docs = corpus.count()  # materialize before the clock starts
        t0 = time.time()
        pairs = minhash_lsh_pairs(corpus, jaccard_threshold=0.5).persist()
        n_pairs = pairs.count()
        stats: dict = {}
        comp = connected_components(pairs, stats=stats)
        n_keep = dedup_keepers(corpus, pairs).filter("is_keeper").count()
        print(
            json.dumps(
                {
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_pairs": n_pairs,
                    "cc_rounds": stats["rounds"],
                    "n_keepers": n_keep,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        pairs.unpersist()
        corpus.unpersist()
        del comp
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
