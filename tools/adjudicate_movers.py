"""Adjudicate r10->r11 bench movers: memo/cache artifact vs real regression.

Mechanism under test: r10's bench took best-of-2 WITHOUT clearing state
between runs, so run 2 of any query whose run 1 left reusable state —
cross-query memos (clear_session_memos), leaked .persist()/.cache()
frames (Spark's CacheManager substitutes a cached InMemoryRelation for
ANY analyzed plan that matches, not just the same object), or freshly
JIT'd codegen — was timed warm, and best-of-2 recorded the warm number.
r11's bench clears memos + catalog cache before EVERY run (best-of-2
cold), so the r11 number is the honest cold cost.

For each mover this probe records, in one session at the bench SF:
  cold  — clear_session_memos() + catalog.clearCache(), then run+noop
          (r11 methodology; expect ~= BENCH_DETAIL r11)
  warm  — immediately re-run WITHOUT clearing (r10 run-2 state;
          expect ~= BENCH_DETAIL r10 if the mover is a warm artifact)

Adjudication rule (written into SCALING.md):
  warm <= 1.3 x r10-recorded  -> r10 number was a warm-state artifact
  else                        -> real-regression candidate; investigate

Usage: python tools/adjudicate_movers.py [query ...]  (default: the
r10->r11 >1.3x & >0.3s mover list). One JSON line per query on stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_incident_analyst_spark.queries import REGISTRY, clear_session_memos
from ai_incident_analyst_spark.session import get_spark

# r10->r11 movers (>1.3x and >+0.3s), from BENCH_DETAIL.json at commits
# 607ded1 (r10) vs 364c58a (r11). NEW-in-r11 queries excluded: they have
# no r10 number to adjudicate.
MOVERS = [
    "theil_sen_daily_trend", "bootstrap_ci_order_total",
    "cusum_drift_events", "k_core_neardup", "seasonal_profile",
    "leakage_safe_split", "neardup_clusters", "conformal_price_intervals",
    "ivf_nprobe_recall", "dedup_survivors", "frequent_item_pairs",
    "k_truss_neardup", "sprt_urgent_orders", "dbscan_embeddings_2d",
    "markov_transitions", "wordpiece_segment_stats",
    "weighted_median_price", "segment_trends_daily_events",
    "k_center_coreset", "dup_span_removal", "shapley_channel_attribution",
    "log_rank_purchase_halves", "changepoints_daily_events", "hits_items",
    "rake_keyphrases_docs", "lpa_communities", "pmi_collocations",
    "srm_event_types", "km_user_churn", "fd_orders", "matryoshka_recall",
    "ngram_lm_bits", "kruskal_wallis_event_values",
    "join_size_forecast_orders", "chi2_type_vs_kparity",
    "benford_order_totals", "quantile_normalize_doclen",
    "cuped_adjusted_values", "mann_whitney_click_vs_view",
]


def main() -> None:
    names = sys.argv[1:] or MOVERS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("adjudicate-movers")
    # Warm the JVM/codegen/page-cache baseline once so the FIRST cold
    # cell isn't also paying session startup (same as a mid-suite cell).
    REGISTRY["count_by_day"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    cycles = int(os.environ.get("SPARK_GRAFT_ADJ_CYCLES", "2"))
    for name in names:
        fn = REGISTRY[name].fn
        cold = warm = float("inf")
        # best-of-N per mode: a single cold/warm pair is hostage to this
        # VM's D-state loadavg spikes (memory-hygiene rule 3)
        for _ in range(cycles):
            clear_session_memos()
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold = min(cold, time.time() - t0)
            # warm: r10 run-2 state — no clearing, run 1's state live
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = min(warm, time.time() - t0)
        clear_session_memos()
        spark.catalog.clearCache()
        print(json.dumps({"query": name, "cold_sec": round(cold, 3),
                          "warm_sec": round(warm, 3),
                          "loadavg": round(os.getloadavg()[0], 2)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
