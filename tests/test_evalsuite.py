"""Eval suite tests: metric semantics + predict/score plumbing.

Expected values follow the reference's metric definitions
(`/root/reference/metrics.py`, `eval_long_bench.py`)."""

import json
import os

import pytest

from kivi_tpu.evalsuite import (DATASET2METRIC, REFERENCE_TASKS, load_jsonl,
                                middle_truncate, predict_task, score_dir,
                                scorer, scorer_e)
from kivi_tpu.evalsuite import metrics as M


def test_normalize_answer():
    assert M.normalize_answer("The  Quick, Brown fox!") == "quick brown fox"


def test_qa_f1():
    assert M.qa_f1_score("Paris", "paris") == 1.0
    # "the" is dropped as an article, "of" is not: P=2/3, R=1 -> F=0.8
    assert abs(M.qa_f1_score("the city of Paris", "Paris, the city")
               - 0.8) < 1e-9
    assert M.qa_f1_score("London", "Paris") == 0.0
    assert 0 < M.qa_f1_score("Paris France", "Paris") < 1


def test_rouge_l():
    assert M.rouge_score("a b c d", "a b c d") == 1.0
    assert M.rouge_score("x y z", "a b c") == 0.0
    # LCS of "a c" in "a b c" = 2 -> P=1, R=2/3 -> F=0.8
    assert abs(M.rouge_score("a c", "a b c") - 0.8) < 1e-9


def test_count_and_retrieval():
    assert M.count_score("there are 7 paragraphs", "7") == 1.0
    assert M.count_score("maybe 6 or 7", "7") == 0.5
    assert M.count_score("no digits here", "7") == 0.0
    assert M.retrieval_score("Paragraph 12", "Paragraph 12") == 1.0
    assert M.retrieval_score("it is 12", "Paragraph 12") == 1.0
    assert M.retrieval_score("3", "Paragraph 12") == 0.0


def test_classification():
    classes = ["location", "number", "entity"]
    assert M.classification_score("the answer is location", "location",
                                  all_classes=classes) == 1.0
    # two classes matched -> half credit
    assert M.classification_score("location or number", "location",
                                  all_classes=classes) == 0.5
    assert M.classification_score("entity", "location",
                                  all_classes=classes) == 0.0


def test_code_sim():
    assert M.code_sim_score("return x + 1", "return x + 1") == 1.0
    # first non-comment line is picked
    assert M.code_sim_score("# comment\nreturn x + 1",
                            "return x + 1") == 1.0


def test_metric_table_covers_reference_tasks():
    for t in REFERENCE_TASKS:
        assert t in DATASET2METRIC


class ToyTok:
    def encode(self, s):
        return s.split()

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(ids) + " "


def test_middle_truncate():
    tok = ToyTok()
    prompt = " ".join(str(i) for i in range(100))
    out = middle_truncate(prompt, tok, 10)
    toks = out.split()
    assert toks[:5] == ["0", "1", "2", "3", "4"]
    assert toks[-5:] == ["95", "96", "97", "98", "99"]
    assert middle_truncate("a b", tok, 10) == "a b"


def test_predict_and_score_roundtrip(tmp_path):
    data = [
        {"input": "what is 2+2?", "context": "arithmetic text",
         "answers": ["4"], "all_classes": [], "length": 1000},
        {"input": "what is 3+3?", "context": "arithmetic text",
         "answers": ["6"], "all_classes": [], "length": 9000},
    ]

    def fake_generate(prompt, max_new):
        return "4" if "2+2" in prompt else "wrong"

    out_path = str(tmp_path / "pred" / "hotpotqa.jsonl")
    recs = predict_task("hotpotqa", data, fake_generate, ToyTok(),
                        max_prompt_len=512, model_name="llama2-7b",
                        out_path=out_path)
    assert len(recs) == 2 and os.path.exists(out_path)
    assert scorer("hotpotqa", recs) == 50.0
    e = scorer_e("hotpotqa", recs)
    assert e["0-4k"] == 100.0 and e["8k+"] == 0.0

    results = score_dir(str(tmp_path / "pred"))
    assert results["hotpotqa"] == 50.0
    assert os.path.exists(tmp_path / "pred" / "result.json")
