"""End-to-end LongBench pipeline: synthesized HF checkpoint + tokenizer ->
run_longbench predict -> score.

Validates the whole H4/H5 stack (reference `pred_long_bench.py` /
`eval_long_bench.py`) against a REAL on-disk HF checkpoint: hf_loader,
AutoTokenizer integration, prompt templating, truncation, engine
generation, jsonl IO, and the scorer — all offline (the checkpoint and
data are built by the test).
"""

import json
import os

import pytest


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM
    from transformers import PreTrainedTokenizerFast
    from tokenizers import Tokenizer, models, pre_tokenizers

    d = tmp_path_factory.mktemp("tiny_llama_ckpt")
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i, w in enumerate(
            ("the a is of and question answer story report code "
             "paragraph number one two three summary yes no "
             "unanswerable next line").split()):
        vocab[w] = len(vocab)
    for i in range(128 - len(vocab)):
        vocab[f"w{i}"] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok,
                                   unk_token="<unk>", bos_token="<s>",
                                   eos_token="</s>")
    fast.save_pretrained(d)

    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    return str(d)


def test_longbench_predict_and_score(hf_checkpoint, tmp_path):
    from kivi_tpu.evalsuite import run_longbench

    data_dir = tmp_path / "data"
    pred_dir = tmp_path / "pred"
    data_dir.mkdir()
    samples = [
        {"input": "what is the answer", "context": "the story is a story "
         * 30, "answers": ["yes"], "length": 600, "all_classes": None},
        {"input": "how many paragraphs", "context": "one two three "
         * 20, "answers": ["3"], "length": 300, "all_classes": None},
    ]
    for task in ("hotpotqa", "passage_count"):
        with open(data_dir / f"{task}.jsonl", "w") as f:
            for s in samples:
                f.write(json.dumps(s) + "\n")

    run_longbench.main([
        "predict", "--model-dir", hf_checkpoint,
        "--data-dir", str(data_dir), "--out-dir", str(pred_dir),
        "--tasks", "hotpotqa,passage_count", "--k-bits", "2",
        "--v-bits", "2", "--group-size", "16", "--residual", "16",
        "--max-len", "640", "--limit", "2",
    ])
    for task in ("hotpotqa", "passage_count"):
        path = pred_dir / f"{task}.jsonl"
        assert path.exists()
        rows = [json.loads(l) for l in open(path)]
        assert len(rows) == 2
        assert all("pred" in r and "answers" in r for r in rows)

    from kivi_tpu.evalsuite.longbench import score_dir
    results = score_dir(str(pred_dir))
    assert set(results) >= {"hotpotqa", "passage_count"}
    for v in results.values():
        assert 0.0 <= v <= 100.0


def test_longbench_predict_chunked_prefill(hf_checkpoint, tmp_path):
    """--prefill-chunk routes prediction through the chunked extend
    path (ragged prompts, two compiles per cache bucket): same pipeline
    must still produce well-formed predictions."""
    from kivi_tpu.evalsuite import run_longbench

    data_dir = tmp_path / "data"
    pred_dir = tmp_path / "pred"
    data_dir.mkdir()
    samples = [
        {"input": "what is the answer", "context": "the story is a story "
         * 30, "answers": ["yes"], "length": 600, "all_classes": None},
        {"input": "how many paragraphs", "context": "one two three "
         * 20, "answers": ["3"], "length": 300, "all_classes": None},
    ]
    with open(data_dir / "hotpotqa.jsonl", "w") as f:
        for s in samples:
            f.write(json.dumps(s) + "\n")

    run_longbench.main([
        "predict", "--model-dir", hf_checkpoint,
        "--data-dir", str(data_dir), "--out-dir", str(pred_dir),
        "--tasks", "hotpotqa", "--k-bits", "2", "--v-bits", "2",
        "--group-size", "16", "--residual", "16", "--max-len", "640",
        "--prefill-chunk", "64", "--limit", "2",
    ])
    rows = [json.loads(l) for l in open(pred_dir / "hotpotqa.jsonl")]
    assert len(rows) == 2
    assert all("pred" in r for r in rows)


def test_long_test_sh_runs(hf_checkpoint, tmp_path):
    """The shell driver itself (scripts/long_test.sh) must run end to
    end — argv wiring included (it shipped broken once: the required
    --data-dir flag was missing and argparse died on first use)."""
    import subprocess
    import sys

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "hotpotqa.jsonl", "w") as f:
        f.write(json.dumps({
            "input": "what is the answer", "context": "one two three",
            "answers": ["yes"], "length": 3, "all_classes": None}) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # fresh interpreter: pre-imported jax defaults to the tunneled TPU;
    # pin the subprocess to CPU (env vars alone are too late there)
    env["KIVI_TPU_PLATFORM"] = "cpu"
    out_dir = tmp_path / "pred"
    proc = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "long_test.sh"),
         "2", "2", "16", "16", hf_checkpoint, str(data_dir),
         str(out_dir)],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (out_dir / "hotpotqa.jsonl").exists()
    assert "hotpotqa" in proc.stdout
