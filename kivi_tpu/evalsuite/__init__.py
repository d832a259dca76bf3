"""Evaluation suite: LongBench predict/score, metrics, demos.

Port of the reference's harness layer (`pred_long_bench.py`,
`eval_long_bench.py`, `metrics.py` — SURVEY.md H4-H6), engine-agnostic.
"""

from kivi_tpu.evalsuite import metrics
from kivi_tpu.evalsuite.longbench import (
    DATASET2MAXLEN,
    DATASET2METRIC,
    DATASET2PROMPT,
    REFERENCE_TASKS,
    build_chat,
    load_jsonl,
    middle_truncate,
    predict_task,
    score_dir,
    scorer,
    scorer_e,
)

__all__ = [
    "metrics", "DATASET2MAXLEN", "DATASET2METRIC", "DATASET2PROMPT",
    "REFERENCE_TASKS", "build_chat", "load_jsonl", "middle_truncate",
    "predict_task", "score_dir", "scorer", "scorer_e",
]
