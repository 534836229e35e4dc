"""Tests for the analysis tools (log parser, cost models)."""

import json

import numpy as np

from tools.cost_models import fit_alpha_beta, fit_cubic, predict_cubic
from tools.parse_logs import EPOCH_RE, ITER_RE, parse


def test_fit_alpha_beta_recovers_model():
    rng = np.random.RandomState(0)
    sizes = np.array([1e3, 1e4, 1e5, 1e6, 1e7])
    alpha, beta = 5e-5, 2e-9
    times = alpha + beta * sizes + rng.randn(5) * 1e-7
    a, b = fit_alpha_beta(sizes, times)
    assert abs(a - alpha) / alpha < 0.1
    assert abs(b - beta) / beta < 0.01


def test_fit_cubic_recovers_model():
    dims = np.array([128, 256, 512, 1024, 2048])
    alpha, gamma = 1e-3, 2e-12
    times = alpha + gamma * dims.astype(float) ** 3
    a, g = fit_cubic(dims, times)
    assert abs(predict_cubic(a, g, 4608) - (alpha + gamma * 4608**3)) < 1e-4


def test_parse_logs(tmp_path):
    log = tmp_path / "run.log"
    log.write_text(
        "2026-01-01 x train_cifar iter 10: io 0.0030s step 0.1200s\n"
        "2026-01-01 x train_cifar iter 20: io 0.0031s step 0.0450s\n"
        "2026-01-01 x train_cifar epoch 0: train loss 1.5000 acc 0.4500 | "
        "val loss 1.6000 acc 0.4200 | lr 0.1000 damping 0.03\n"
        "2026-01-01 x train_cifar epoch 1: train loss 1.1000 acc 0.6000 | "
        "val loss 1.2000 acc 0.5800 | lr 0.1000 damping 0.03\n"
        "2026-01-01 x timer summary: {'io': 0.003, 'step': 0.05}\n"
    )
    parsed = parse(str(log))
    assert len(parsed["epochs"]) == 2
    assert parsed["epochs"][1]["val_acc"] == 0.58
    assert len(parsed["iters"]) == 2
    assert parsed["iters"][0]["step"] == 0.12
    assert parsed["summary"]["step"] == 0.05


def test_make_dataset_npz_cifar_end_to_end(tmp_path):
    """Converter on synthesized raw CIFAR-10 pickle batches, then
    train_cifar.py --data-path runs end-to-end on the produced npz
    (reference raw format: torchvision's python-version batches,
    pytorch_cifar10_resnet.py:158-192)."""
    import pickle
    import subprocess
    import sys
    import os

    from tools.make_dataset_npz import convert_cifar

    raw = tmp_path / "cifar-10-batches-py"
    raw.mkdir()
    rng = np.random.RandomState(0)
    raw_rows = {}
    # bit-replica of the torchvision python-version batch pickles: CHW
    # uint8 rows under b'data', plus the b'batch_label'/b'filenames' keys
    # real batches carry (the loader must ignore them)
    for name, n in [(f"data_batch_{i}", 20) for i in range(1, 6)] + [
        ("test_batch", 20)
    ]:
        rows = rng.randint(0, 256, (n, 3072), dtype=np.uint8)
        raw_rows[name] = rows
        with open(raw / name, "wb") as f:
            pickle.dump(
                {
                    b"batch_label": f"batch of {name}".encode(),
                    b"data": rows,
                    b"labels": rng.randint(0, 10, n).tolist(),
                    b"filenames": [
                        f"img_{i}.png".encode() for i in range(n)
                    ],
                },
                f,
            )
    out = tmp_path / "cifar10.npz"
    convert_cifar(str(raw), str(out), "cifar10")
    d = np.load(out)
    assert d["x_train"].shape == (100, 32, 32, 3)
    assert d["x_train"].dtype == np.uint8
    assert d["x_test"].shape == (20, 32, 32, 3)
    assert d["y_train"].dtype == np.int32
    # pixel-exact round trip: row 0 of data_batch_1 is 3072 CHW bytes ->
    # NHWC image (reference reshape semantics,
    # pytorch_cifar10_resnet.py:158-192 via torchvision)
    expect = raw_rows["data_batch_1"][0].reshape(3, 32, 32).transpose(
        1, 2, 0)
    np.testing.assert_array_equal(d["x_train"][0], expect)
    np.testing.assert_array_equal(
        d["x_test"][-1],
        raw_rows["test_batch"][-1].reshape(3, 32, 32).transpose(1, 2, 0),
    )

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "examples", "train_cifar.py"),
            "--model", "resnet20", "--data-path", str(out),
            "--iters", "2", "--epochs", "1", "--batch-size", "16",
        ],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]


def test_make_dataset_npz_multi30k(tmp_path):
    """Multi-30k converter: whitespace-tokenized parallel text -> the
    src/trg npz train_multi30k.py consumes; torchtext special ids
    (<unk>=0 <pad>=1 <bos>=2 <eos>=3) and bos/eos-wrapped targets."""
    from tools.make_dataset_npz import BOS, EOS, PAD, convert_multi30k

    src = tmp_path / "train.de"
    trg = tmp_path / "train.en"
    # 60 sentence pairs so min_freq=2 keeps the repeated words
    lines_de = ["ein mann geht", "eine frau liest", "ein hund rennt"] * 20
    lines_en = ["a man walks", "a woman reads", "a dog runs"] * 20
    src.write_text("\n".join(lines_de), encoding="utf-8")
    trg.write_text("\n".join(lines_en), encoding="utf-8")

    class A:
        src_train = str(src)
        trg_train = str(trg)
        src_test = None
        trg_test = None
        seq_len = 12
        min_freq = 2
        max_vocab = None
        vocab_json = str(tmp_path / "vocab.json")
        out = str(tmp_path / "m30k.npz")

    convert_multi30k(A)
    d = np.load(A.out)
    assert d["src_train"].dtype == np.int32
    assert d["src_train"].shape[1] == 12
    assert d["trg_train"][0, 0] == BOS
    assert EOS in d["trg_train"][0]
    # padding after sentence end
    assert d["src_train"][0, -1] == PAD
    assert int(d["src_vocab_size"]) > 4
    # vocab json sidecar round-trips
    v = json.load(open(A.vocab_json, encoding="utf-8"))
    assert v["specials"][PAD] == "<pad>"
    assert "mann" in v["src"]


def test_make_dataset_npz_wikitext(tmp_path):
    from tools.make_dataset_npz import convert_wikitext

    f = tmp_path / "wiki.train.tokens"
    f.write_text("the cat sat\nthe dog ran\n", encoding="utf-8")
    out = tmp_path / "wiki.npz"
    convert_wikitext([str(f)], str(out))
    d = np.load(out)
    assert d["tokens"].dtype == np.int32
    assert d["tokens"].size == 8  # 3 words + <eos>, twice
    assert int(d["vocab_size"]) >= 5


def test_calibration_apply(tmp_path, monkeypatch):
    """Calibration JSON round-trip: apply_calibration patches the factor
    dispatch constants and production_block_kwargs picks up the merge
    overrides; absent file is a no-op."""
    from kfac_pytorch_tpu.ops import factors as fops
    from kfac_pytorch_tpu.preconditioner import production_block_kwargs
    from kfac_pytorch_tpu.utils import calibration as cal

    orig_rows = fops._PALLAS_ROWS_PER_C
    orig_bytes = fops._AUTO_BF16_MIN_BYTES
    try:
        # no file -> no-op
        monkeypatch.chdir(tmp_path)
        assert cal.apply_calibration() == {}
        assert fops._PALLAS_ROWS_PER_C == orig_rows

        cfg = {
            "pallas_rows_per_c": 42.0,
            "auto_bf16_min_bytes": 1e7,
            "merge_flop_rate": 1.5e14,
            "merge_hbm_rate": 5e11,
            "meta": {"device": "test"},
        }
        path = tmp_path / "calibration.json"
        path.write_text(json.dumps(cfg))
        data = cal.apply_calibration(str(path))
        assert fops._PALLAS_ROWS_PER_C == 42.0
        assert fops._AUTO_BF16_MIN_BYTES == 1e7
        kw = production_block_kwargs(data)
        assert kw["merge_flop_rate"] == 1.5e14
        assert kw["merge_hbm_rate"] == 5e11
        assert kw["merge_dispatch_cost"] == 3.0e-5  # default kept
        # default-path discovery via cwd
        assert cal.find_calibration() == "calibration.json"
    finally:
        fops.set_dispatch_constants(orig_rows, orig_bytes)


def test_calibrate_tool_quick_smoke(tmp_path):
    """tools/calibrate.py --quick runs end-to-end on CPU (numbers are
    meaningless there; the test checks plumbing + JSON schema)."""
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "cal.json"
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "calibrate.py"),
         "--quick", "--skip", "bf16", "-o", str(out)],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.loads(out.read_text())
    assert "merge_flop_rate" in d and d["merge_flop_rate"] > 0
    assert "merge_dispatch_cost" in d and d["merge_dispatch_cost"] > 0
    assert "pallas_rows_per_c" in d


def test_make_dataset_npz_squad(tmp_path):
    """SQuAD converter on a tiny synthesized v1.1 JSON + local vocab file,
    via the reference's own transformers feature pipeline."""
    import os
    import subprocess
    import sys as _sys

    vocab = tmp_path / "vocab.txt"
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "cat",
             "sat", "on", "mat", "what", "did", "do", "?", "a", "."]
    vocab.write_text("\n".join(words), encoding="utf-8")
    data = {
        "version": "1.1",
        "data": [{
            "title": "t",
            "paragraphs": [{
                "context": "the cat sat on the mat .",
                "qas": [{
                    "id": "q1",
                    "question": "what did the cat do ?",
                    "answers": [{"text": "sat", "answer_start": 8}],
                }],
            }],
        }],
    }
    train_json = tmp_path / "train-v1.1.json"
    train_json.write_text(json.dumps(data), encoding="utf-8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "squad.npz"
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "make_dataset_npz.py"),
         "squad", str(train_json), "--vocab-file", str(vocab),
         "--seq-len", "32", "--doc-stride", "16", "-o", str(out)],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    d = np.load(out)
    assert d["input_ids"].shape == (1, 32)
    assert d["input_ids"].dtype == np.int32
    sp, ep = int(d["start_positions"][0]), int(d["end_positions"][0])
    assert 0 < sp <= ep < 32
    # the span tokens decode back to the answer ("sat" = vocab id 7)
    assert d["input_ids"][0, sp] == words.index("sat")


def test_profile_summary_by_source(tmp_path):
    """profile_summary aggregates device events, skips scan/step envelopes,
    and groups by the emitting source line."""
    import gzip
    import json as _json

    from tools.profile_summary import summarize, summarize_by_source

    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # envelopes that must NOT double-count
        {"ph": "X", "pid": 1, "tid": 2, "name": "0", "dur": 1000.0},
        {"ph": "X", "pid": 1, "tid": 2, "name": "while.8", "dur": 900.0},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1", "dur": 400.0,
         "args": {"source": "/repo/a.py:10"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.2", "dur": 200.0,
         "args": {"source": "/repo/a.py:11"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "copy.3", "dur": 100.0,
         "args": {"source": "/repo/b.py:5"}},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        _json.dump({"traceEvents": events}, f)

    by_file, by_src = summarize_by_source(str(tmp_path), steps=1)
    assert by_file["/repo/a.py"] == 600.0
    assert by_file["/repo/b.py"] == 100.0
    assert by_src["/repo/a.py:10"] == 400.0
    # name-level view: envelopes excluded from per-op totals
    by_class, by_name = summarize(str(tmp_path), top=5)
    assert "0" not in by_name and "while.8" not in by_name
    assert by_name["fusion.1"] == 400.0
