"""GloVe .txt -> {word: np.ndarray} pickle (reference data/glove/txt2pickle.py).

    python data/glove/txt2pickle.py [--txt glove.840B.300d.txt] [--out glove.840.300d.pkl]

Parses line-by-line instead of via pandas (robust to words containing
spaces-adjacent tokens in the 840B vocab).
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def _infer_dim(parts) -> int:
    """Longest all-float suffix of the first line = the vector dimension."""
    dim = 0
    for field in reversed(parts):
        try:
            float(field)
            dim += 1
        except ValueError:
            break
    if dim == 0:
        raise ValueError("first line has no numeric fields — not a GloVe txt file")
    return dim


def convert(txt_path: str, out_path: str) -> int:
    glove = {}
    dim = None
    with open(txt_path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if dim is None:
                dim = _infer_dim(parts)
            # 840B vocab contains tokens adjacent to spaces; the vector is
            # always the last `dim` fields, the word is everything before
            word = " ".join(parts[:-dim])
            glove[word] = np.asarray(parts[-dim:], dtype=np.float32)
    with open(out_path, "wb") as f:
        pickle.dump(glove, f)
    return len(glove)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--txt", default="glove.840B.300d.txt")
    p.add_argument("--out", default="glove.840.300d.pkl")
    args = p.parse_args()
    n = convert(args.txt, args.out)
    print(f"wrote {n} vectors to {args.out}")
