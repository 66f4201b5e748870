"""End-to-end example: EXPERIMENT ANALYSIS on the events stream.

Run:  python examples/experimentation.py [sf_dir]

One deterministic discipline (md5 user split, integer epoch-us period
cut, exact integer moments -> one shared double tree per estimator)
carried through three estimators of increasing sophistication, plus the
guard rails an experimentation platform runs beside them — every step a
first-class oracle-gated key (COVERAGE.md):

  randomized A/B z-test        -> q_events_ab_test
  CUPED variance reduction     -> q_events_ab_cuped (Deng et al. 2013)
  difference-in-differences    -> q_events_did (non-randomized rollouts)
  robust outlier guard         -> q_events_outliers_mad (median/MAD)
  sample-ratio / drift check   -> q_events_drift_chi2
  bot contamination            -> q_events_bot_flags
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import queries


def main(sf_dir: str, stop: bool = True) -> None:
    spark = get_spark("kscs-experimentation-example")
    qs = queries()

    # 1. The randomized readout: pooled two-proportion z on conversion.
    print("— A/B z-test (conversion) —")
    qs["q_events_ab_test"](spark, sf_dir).show(truncate=False)

    # 2. Same split, sharper: pre-period activity absorbs between-user
    #    variance (theta = cov/var over exact integer moments).
    print("— CUPED-adjusted effect —")
    qs["q_events_ab_cuped"](spark, sf_dir).show(truncate=False)

    # 3. When assignment ISN'T randomized: pre->post change net of the
    #    control group's change.
    print("— difference-in-differences —")
    qs["q_events_did"](spark, sf_dir).show(truncate=False)

    # 4. Guard rails: heavy-tail-safe outliers, distribution drift
    #    between the experiment halves, and bot contamination — the
    #    checks that invalidate a readout before anyone ships on it.
    n_out = qs["q_events_outliers_mad"](spark, sf_dir).count()
    print(f"median/MAD outliers flagged: {n_out}")
    print("— timeline-half drift (chi², per event type) —")
    qs["q_events_drift_chi2"](spark, sf_dir).orderBy("event_type").show(
        truncate=False
    )
    n_bots = qs["q_events_bot_flags"](spark, sf_dir).count()
    print(f"bot-flagged users: {n_bots}")

    if stop:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
