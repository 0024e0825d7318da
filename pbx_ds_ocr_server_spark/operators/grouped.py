"""Grouped-map (``applyInPandas``) operators.

Completes the pandas-API surface next to ``mapInPandas`` (extract) and
``applyInPandasWithState`` (streaming sessions): whole-group computations
that genuinely need the group in memory — here per-label embedding
normalization, the feature-preprocessing step of an embedding pipeline.

Groups must fit in executor memory — appropriate for label/shard-level
groups (thousands to millions of rows), not per-key micro-groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ZSCORE_SCHEMA = "vec_id bigint, label int, dim int, z double"


def zscore_by_label(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 4,
) -> DataFrame:
    """Per-label, per-dimension z-scores of embedding components, long form
    (vec_id, label, dim, z). Population std; zero-variance dims emit z=0.

    One grouped-map pass; math in float64 so results mirror ANSI
    avg/stddev_pop to well inside ``round_dp`` decimals.
    """
    src = df.select(id_col, label_col, vec_col)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        mean = mat.mean(axis=0)
        std = mat.std(axis=0)  # population
        z = (mat - mean) / np.where(std == 0.0, 1.0, std)
        n, dims = mat.shape
        return pd.DataFrame(
            {
                "vec_id": np.repeat(pdf[id_col].to_numpy(), dims),
                "label": np.repeat(pdf[label_col].to_numpy(), dims),
                "dim": np.tile(np.arange(dims), n),
                "z": np.round(z.ravel(), round_dp),
            }
        )

    return src.groupBy(label_col).applyInPandas(fn, schema=ZSCORE_SCHEMA)
