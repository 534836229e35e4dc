#!/usr/bin/env python
"""Convert raw datasets into the .npz files the training harnesses consume.

The reference loads CIFAR via torchvision's pickle reader
(/root/reference/examples/pytorch_cifar10_resnet.py:158-192), Multi-30k via
torchtext Fields with whitespace/spacy tokens and <unk>/<pad>/<bos>/<eos>
specials (/root/reference/examples/pytorch_multi30k_transformer.py:225-233),
and WikiText-2 via a word-level corpus dictionary
(/root/reference/examples/pytorch_wikitext_rnn.py:64-94). This environment
has no network access, so the harnesses read pre-converted .npz instead;
this tool produces those files from the SAME raw artifacts the reference's
dataset downloads contain, making the real-data parity runs executable the
moment the raw data exists.

Subcommands:

  cifar10  DIR  -o cifar10.npz
      DIR holds the standard python-version batches (data_batch_1..5,
      test_batch — each a pickle with b'data' (N, 3072) uint8 CHW rows and
      b'labels'). Output keys: x_train/y_train/x_test/y_test, images
      uint8 NHWC (the harness normalizes with the reference statistics).

  cifar100 DIR  -o cifar100.npz
      Same for the CIFAR-100 python version (files 'train'/'test', labels
      b'fine_labels').

  multi30k --src-train train.de --trg-train train.en
           [--src-test ...] [--trg-test ...] -o multi30k.npz
      Whitespace-tokenized parallel text, one sentence per line (apply
      your own tokenizer/BPE beforehand; the reference used spacy tokens).
      Builds vocabs from the TRAIN side with --min-freq (reference
      MIN_FREQ=2), specials <unk>=0 <pad>=1 <bos>=2 <eos>=3 (torchtext
      order — the ids train_multi30k.py assumes), wraps target sentences
      in <bos>...<eos>, truncates/pads to --seq-len. Output keys:
      src_train/trg_train/src_test/trg_test int32 plus src_vocab/trg_vocab
      sizes (pass those to --src-vocab/--trg-vocab).

  wikitext FILE [FILE...] -o wikitext.npz
      Word-level corpus: first file builds the vocab (with <eos> appended
      per line, reference wikitext corpus convention); all files
      concatenate into one int32 'tokens' stream.

Unit-tested against synthesized raw files in tests/test_tools.py.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from collections import Counter

import numpy as np

UNK, PAD, BOS, EOS = 0, 1, 2, 3
SPECIALS = ["<unk>", "<pad>", "<bos>", "<eos>"]


# ----------------------------------------------------------------- cifar


def _load_cifar_batch(path, label_key):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"] if b"data" in d else d["data"]
    labels = d.get(label_key) if label_key in d else d[label_key.decode()]
    x = np.asarray(data, np.uint8).reshape(-1, 3, 32, 32)
    x = x.transpose(0, 2, 3, 1)  # CHW rows -> NHWC
    return x, np.asarray(labels, np.int32)


def convert_cifar(d, out, variant="cifar10"):
    if variant == "cifar10":
        train_files = [
            os.path.join(d, f"data_batch_{i}") for i in range(1, 6)
        ]
        test_files = [os.path.join(d, "test_batch")]
        label_key = b"labels"
    else:
        train_files = [os.path.join(d, "train")]
        test_files = [os.path.join(d, "test")]
        label_key = b"fine_labels"
    missing = [p for p in train_files + test_files if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(f"raw {variant} batches missing: {missing}")
    xs, ys = zip(*(_load_cifar_batch(p, label_key) for p in train_files))
    x_train, y_train = np.concatenate(xs), np.concatenate(ys)
    xs, ys = zip(*(_load_cifar_batch(p, label_key) for p in test_files))
    x_test, y_test = np.concatenate(xs), np.concatenate(ys)
    np.savez_compressed(
        out, x_train=x_train, y_train=y_train, x_test=x_test, y_test=y_test
    )
    print(
        f"{out}: x_train {x_train.shape} uint8, y {int(y_train.max()) + 1} "
        f"classes, x_test {x_test.shape}"
    )


# --------------------------------------------------------------- multi30k


def _read_lines(path):
    with open(path, encoding="utf-8") as f:
        return [ln.strip().split() for ln in f if ln.strip()]


def build_vocab(sentences, min_freq=2, max_size=None):
    """Word -> id map with the torchtext special ordering (special tokens
    appearing in the text keep their reserved ids, not fresh ones)."""
    counts = Counter(
        tok for s in sentences for tok in s if tok not in SPECIALS
    )
    words = [w for w, c in counts.most_common(max_size) if c >= min_freq]
    return {w: i + len(SPECIALS) for i, w in enumerate(words)}


def encode(sentences, vocab, seq_len, add_bos_eos=False):
    n = len(sentences)
    out = np.full((n, seq_len), PAD, np.int32)
    for i, s in enumerate(sentences):
        ids = [vocab.get(t, UNK) for t in s]
        if add_bos_eos:
            ids = [BOS] + ids[: seq_len - 2] + [EOS]
        else:
            ids = ids[:seq_len]
        out[i, : len(ids)] = ids
    return out


def convert_multi30k(args):
    src_tr = _read_lines(args.src_train)
    trg_tr = _read_lines(args.trg_train)
    if len(src_tr) != len(trg_tr):
        raise ValueError(
            f"train sides differ: {len(src_tr)} vs {len(trg_tr)} sentences"
        )
    src_vocab = build_vocab(src_tr, args.min_freq, args.max_vocab)
    trg_vocab = build_vocab(trg_tr, args.min_freq, args.max_vocab)
    arrays = {
        "src_train": encode(src_tr, src_vocab, args.seq_len),
        "trg_train": encode(trg_tr, trg_vocab, args.seq_len,
                            add_bos_eos=True),
    }
    if args.src_test and args.trg_test:
        arrays["src_test"] = encode(
            _read_lines(args.src_test), src_vocab, args.seq_len
        )
        arrays["trg_test"] = encode(
            _read_lines(args.trg_test), trg_vocab, args.seq_len,
            add_bos_eos=True,
        )
    else:  # hold out the tail of train as eval, reference-style split sizes
        k = max(len(src_tr) // 30, 1)
        arrays["src_test"] = arrays["src_train"][-k:]
        arrays["trg_test"] = arrays["trg_train"][-k:]
        arrays["src_train"] = arrays["src_train"][:-k]
        arrays["trg_train"] = arrays["trg_train"][:-k]
    n_src = len(src_vocab) + len(SPECIALS)
    n_trg = len(trg_vocab) + len(SPECIALS)
    np.savez_compressed(
        args.out, src_vocab_size=np.int32(n_src),
        trg_vocab_size=np.int32(n_trg), **arrays,
    )
    if args.vocab_json:
        with open(args.vocab_json, "w", encoding="utf-8") as f:
            json.dump({"specials": SPECIALS, "src": src_vocab,
                       "trg": trg_vocab}, f, ensure_ascii=False)
    print(
        f"{args.out}: {arrays['src_train'].shape[0]} train / "
        f"{arrays['src_test'].shape[0]} test pairs, seq_len {args.seq_len}, "
        f"src_vocab {n_src} trg_vocab {n_trg} "
        f"(pass --src-vocab {n_src} --trg-vocab {n_trg})"
    )


# --------------------------------------------------------------- wikitext


def convert_wikitext(files, out, min_freq=1):
    per_file = []
    for p in files:
        with open(p, encoding="utf-8") as f:
            per_file.append(
                [ln.split() + ["<eos>"] for ln in f if ln.strip()]
            )
    vocab = build_vocab(per_file[0], min_freq=min_freq)
    vocab["<eos>"] = EOS  # keep the special id stable
    tokens = np.asarray(
        [
            vocab.get(t, UNK)
            for lines in per_file
            for s in lines
            for t in s
        ],
        np.int32,
    )
    np.savez_compressed(out, tokens=tokens,
                        vocab_size=np.int32(len(vocab) + len(SPECIALS)))
    print(f"{out}: {tokens.size} tokens, vocab {len(vocab) + len(SPECIALS)}")


# ------------------------------------------------------------------ squad


def convert_squad(args):
    """SQuAD v1.1 train JSON + a local BERT vocab.txt -> the features npz
    train_squad.py consumes (input_ids, attention_mask, token_type_ids,
    start_positions, end_positions). Uses the SAME transformers utilities
    the reference harness runs (SquadV1Processor +
    squad_convert_examples_to_features,
    /root/reference/examples/pytorch_squad_bert.py:94-137), so
    tokenization/feature semantics match exactly; the tokenizer loads from
    the local vocab file (no network)."""
    from transformers import BertTokenizer
    from transformers.data.processors.squad import (
        SquadV1Processor,
        squad_convert_examples_to_features,
    )

    # the SLOW python tokenizer: squad_convert_examples_to_features feeds
    # pre-tokenized id lists, which the fast (rust) tokenizer rejects —
    # same combination the reference ran (transformers' own squad example)
    tokenizer = BertTokenizer(
        vocab_file=args.vocab_file, do_lower_case=not args.cased
    )
    processor = SquadV1Processor()
    data_dir = os.path.dirname(os.path.abspath(args.train_json))
    examples = processor.get_train_examples(
        data_dir, filename=os.path.basename(args.train_json)
    )
    if args.max_examples:
        examples = examples[: args.max_examples]
    features = squad_convert_examples_to_features(
        examples=examples,
        tokenizer=tokenizer,
        max_seq_length=args.seq_len,
        doc_stride=args.doc_stride,
        max_query_length=args.max_query_length,
        is_training=True,
        return_dataset=False,
        threads=1,
    )
    arrays = dict(
        input_ids=np.asarray([f.input_ids for f in features], np.int32),
        attention_mask=np.asarray(
            [f.attention_mask for f in features], np.int32
        ),
        token_type_ids=np.asarray(
            [f.token_type_ids for f in features], np.int32
        ),
        start_positions=np.asarray(
            [f.start_position for f in features], np.int32
        ),
        end_positions=np.asarray(
            [f.end_position for f in features], np.int32
        ),
    )
    np.savez_compressed(args.out, **arrays)
    print(
        f"{args.out}: {arrays['input_ids'].shape[0]} features from "
        f"{len(examples)} examples, seq_len {args.seq_len}"
    )


# ------------------------------------------------------------------ main


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("cifar10", "cifar100"):
        sp = sub.add_parser(name)
        sp.add_argument("dir")
        sp.add_argument("-o", "--out", default=f"{name}.npz")

    sp = sub.add_parser("multi30k")
    sp.add_argument("--src-train", required=True)
    sp.add_argument("--trg-train", required=True)
    sp.add_argument("--src-test")
    sp.add_argument("--trg-test")
    sp.add_argument("--seq-len", type=int, default=64)
    sp.add_argument("--min-freq", type=int, default=2)
    sp.add_argument("--max-vocab", type=int, default=None)
    sp.add_argument("--vocab-json", default=None)
    sp.add_argument("-o", "--out", default="multi30k.npz")

    sp = sub.add_parser("wikitext")
    sp.add_argument("files", nargs="+")
    sp.add_argument("--min-freq", type=int, default=1)
    sp.add_argument("-o", "--out", default="wikitext.npz")

    sp = sub.add_parser("squad")
    sp.add_argument("train_json", help="SQuAD v1.1 train-v1.1.json")
    sp.add_argument("--vocab-file", required=True,
                    help="local BERT vocab.txt (e.g. bert-base-uncased's)")
    sp.add_argument("--cased", action="store_true")
    sp.add_argument("--seq-len", type=int, default=384)
    sp.add_argument("--doc-stride", type=int, default=128)
    sp.add_argument("--max-query-length", type=int, default=64)
    sp.add_argument("--max-examples", type=int, default=None)
    sp.add_argument("-o", "--out", default="squad_train.npz")

    args = p.parse_args(argv)
    if args.cmd in ("cifar10", "cifar100"):
        convert_cifar(args.dir, args.out, args.cmd)
    elif args.cmd == "multi30k":
        convert_multi30k(args)
    elif args.cmd == "squad":
        convert_squad(args)
    else:
        convert_wikitext(args.files, args.out, args.min_freq)
    return 0


if __name__ == "__main__":
    sys.exit(main())
