"""Plan audit: dump the formatted executed plan of every (lazy)
registry query, for eyeballing shuffle counts, pushed filters, scan
schemas, and codegen spans in one place.

Usage: python tools/explain_all.py [sf_dir] [name ...] > plans.txt
Eager iterative queries (Lloyd/BPE/propagation training at build
time) are skipped unless explicitly named -- building them RUNS jobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.session import get_spark

EAGER = {
    "dedup_clusters", "dedup_clusters_jaccard", "curate_documents",
    "leakage_safe_split", "kmeans_cells", "ann_ivf_kmeans", "cluster_topics",
    "pq_codes", "pq_search", "ann_ivfpq", "ann_ivfpq_residual",
    "semantic_dedup", "bpe_merges", "bpe_encode", "bpe_compression_by_lang",
    "pack_sequences_bpe", "cosupply_kcore",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or [n for n in registry.QUERIES if n not in EAGER]
    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        except Exception as exc:  # noqa: BLE001 -- audit tool, keep going
            print(f"!! failed to build: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
