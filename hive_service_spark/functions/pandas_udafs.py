"""Pandas GROUPED_AGG UDAF helpers (custom-UDAF extension surface).

This module deliberately does NOT use ``from __future__ import
annotations``: ``F.pandas_udf`` infers the GROUPED_AGG evaluation type
from the live ``(v: pd.Series) -> float`` hints, and PEP-563
stringified hints cannot be resolved when pandas is imported
function-locally (``typing.get_type_hints`` raises, surfacing as
``PySparkNotImplementedError [UNSUPPORTED_SIGNATURE]``).  Keeping the
decorated functions here — with pandas imported at module scope — keeps
the inference path working while the rest of the package stays on
future annotations.

Reference: Hive's GenericUDAFResolver2 custom-UDAF extension surface
[src: ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
GenericUDAFEvaluator.java].
"""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("bigint")
def np_count(v: pd.Series) -> int:
    # GROUPED_AGG UDFs cannot be mixed with built-in aggregates in one
    # .agg() ([INVALID_PANDAS_UDF_PLACEMENT]), so the count rides along
    # as a pandas UDAF too.
    return int(len(v))


@F.pandas_udf("double")
def np_median(v: pd.Series) -> float:
    return float(np.median(v))


@F.pandas_udf("double")
def np_p75(v: pd.Series) -> float:
    return float(np.percentile(v, 75))
