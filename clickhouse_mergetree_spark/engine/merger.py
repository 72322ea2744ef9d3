"""Compaction policy — candidate selection and scoring over manifest rows.

Pure metadata arithmetic on the driver (no Spark job): the reference
computes these over in-memory part objects (src/merger.cpp:84-174); we
compute them over manifest entries. The merge *job* itself lives in
merge_tree.SparkMergeTree.

Scoring formula reimplemented semantically from the reference
(src/merger.cpp:140-174):

    score = (min_size / max_size)            # prefer similar-sized parts
          * (1 / num_parts)                  # prefer fewer parts per merge
          * min(1, total_size / 10 MiB)      # prefer merges worth the I/O
          * 100

Candidate enumeration (src/merger.cpp:84-130): all pairs + consecutive
triples. Deviation from the reference, documented: the reference calls
select_merge_candidates(max_candidates=1), which stops enumeration at the
FIRST positive-scoring pair — effectively always merging parts (0, 1). We
enumerate all candidates and pick the best score; same data semantics,
strictly better scheduling.
"""

from __future__ import annotations

from dataclasses import dataclass

from clickhouse_mergetree_spark.engine.manifest import PartMeta

_TEN_MIB = 10 * 1024 * 1024


@dataclass
class MergeCandidate:
    part_ids: list[int]
    total_rows: int
    total_size: int
    score: float


def calculate_merge_score(parts: list[PartMeta]) -> float:
    """Reference scoring formula (src/merger.cpp:140-174) over manifest rows."""
    if not parts:
        return 0.0
    sizes = [p.disk_size for p in parts]
    total_rows = sum(p.row_count for p in parts)
    total_size = sum(sizes)
    if total_rows <= 0 or total_size <= 0:
        return 0.0
    size_ratio = min(sizes) / max(sizes)
    parts_factor = 1.0 / len(parts)
    size_factor = min(1.0, total_size / _TEN_MIB)
    return size_ratio * parts_factor * size_factor * 100.0


def select_merge_candidates(parts: list[PartMeta]) -> list[MergeCandidate]:
    """All pairs + consecutive triples, best score first
    (reference src/merger.cpp:84-130; see module docstring for the
    max_candidates deviation)."""
    if len(parts) < 2:
        return []
    candidates: list[MergeCandidate] = []

    def add(group: list[PartMeta]) -> None:
        score = calculate_merge_score(group)
        if score > 0:
            candidates.append(MergeCandidate(
                part_ids=[p.part_id for p in group],
                total_rows=sum(p.row_count for p in group),
                total_size=sum(p.disk_size for p in group),
                score=score,
            ))

    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            add([parts[i], parts[j]])
    for i in range(len(parts) - 2):
        add([parts[i], parts[i + 1], parts[i + 2]])

    candidates.sort(key=lambda c: -c.score)
    return candidates
