"""Raw-ID <-> contiguous-index mappings, first-appearance ordered.

Parity with ``src/data/indexers.py:15-56``. First-appearance order matters:
it pins which raw ID owns which embedding row, making runs reproducible and
letting sharded tables assign contiguous row ranges per shard.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class IndexMapping:
    """Bidirectional mapping between raw IDs and contiguous indices."""

    id_to_index: dict[str, int]
    index_to_id: list[str]

    def __len__(self) -> int:
        return len(self.index_to_id)

    def to_index(self, raw_id: str) -> int:
        try:
            return self.id_to_index[raw_id]
        except KeyError as exc:
            raise KeyError(f"ID '{raw_id}' missing from index mapping") from exc

    def to_id(self, index: int) -> str:
        try:
            return self.index_to_id[index]
        except IndexError as exc:
            raise IndexError(f"Index {index} out of bounds for mapping") from exc


def build_index_mapping(values: Iterable[str]) -> IndexMapping:
    """Create an IndexMapping preserving order of first appearance.

    Array-like inputs take a vectorized path (``pd.factorize`` returns
    uniques in first-appearance order — the same order the Python loop
    produces, at C speed over millions of rows).
    """
    if isinstance(values, (pd.Series, pd.Index, np.ndarray)):
        _, uniques = pd.factorize(np.asarray(values), use_na_sentinel=False)
        index_to_id = [str(v) for v in np.asarray(uniques)]
        return IndexMapping(
            id_to_index={v: i for i, v in enumerate(index_to_id)},
            index_to_id=index_to_id,
        )
    id_to_index: dict[str, int] = {}
    index_to_id: list[str] = []
    for value in values:
        if value not in id_to_index:
            id_to_index[value] = len(index_to_id)
            index_to_id.append(value)
    return IndexMapping(id_to_index=id_to_index, index_to_id=index_to_id)
