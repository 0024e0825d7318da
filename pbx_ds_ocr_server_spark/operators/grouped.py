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

def zscore_by_label(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 4,
) -> DataFrame:
    """Per-label, per-dimension z-scores of embedding components, long form
    (id_col, label_col, dim, z). Population std; zero-variance dims emit
    z=0.

    One grouped-map pass; math in float64 so results mirror ANSI
    avg/stddev_pop to well inside ``round_dp`` decimals. The output schema
    INHERITS the id/label column types from the input (eleventh-review
    fix: a hardcoded "bigint, int" schema made every non-default-typed
    id/label Arrow-cast-fail at runtime). Rounding is half-away-from-zero
    — sign(z)·floor(|z|·10^dp + 0.5) — matching SQL round() on SIGNED
    values; np.round's banker's rule would flip an exact-tie digit
    against the DuckDB mirror."""
    src = df.select(id_col, label_col, vec_col)
    id_t = src.schema[id_col].dataType.simpleString()
    lab_t = src.schema[label_col].dataType.simpleString()
    schema = f"`{id_col}` {id_t}, `{label_col}` {lab_t}, dim int, z double"
    scale = float(10**round_dp)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        mean = mat.mean(axis=0)
        std = mat.std(axis=0)  # population
        z = ((mat - mean) / np.where(std == 0.0, 1.0, std)).ravel()
        n, dims = mat.shape
        return pd.DataFrame(
            {
                id_col: np.repeat(pdf[id_col].to_numpy(), dims),
                label_col: np.repeat(pdf[label_col].to_numpy(), dims),
                "dim": np.tile(np.arange(dims), n),
                "z": np.sign(z) * np.floor(np.abs(z) * scale + 0.5) / scale,
            }
        )

    return src.groupBy(label_col).applyInPandas(fn, schema=schema)
