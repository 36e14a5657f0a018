"""Dataset IO: Gemini binary edge files and text feature/label/mask tables.

File formats (identical to the reference so existing datasets drop in):

* **edge file** — consecutive little-endian ``uint32 (src, dst)`` pairs,
  8 bytes/edge (ref: core/graph.hpp:1127-1143 ``load_directed``;
  data/generate_nts_dataset.py writes this format).
* **feature file** — text, one line per vertex: ``id f_0 f_1 ... f_{F-1}``
  (ref: core/ntsDataloador.hpp:156-230 ``readFeature_Label_Mask``).
* **label file** — text ``id label`` (same function).
* **mask file** — text ``id {train|eval|val|test}``; encoded train=0,
  eval/val=1, test=2 (ref: core/ntsDataloador.hpp:40-42,190-205).
"""

from __future__ import annotations

import numpy as np

MASK_TRAIN = 0
MASK_VAL = 1
MASK_TEST = 2

_MASK_ENCODING = {"train": MASK_TRAIN, "eval": MASK_VAL, "val": MASK_VAL,
                  "test": MASK_TEST}


def read_edge_file(path: str, num_vertices: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Read a Gemini binary edge file → (src, dst) int32 arrays.

    Ref: core/graph.hpp:1127-1181 (each rank reads a slice; here one host
    reads all — partitioning happens later, device-side slices are built in
    partition.py).
    """
    import os
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"EDGE_FILE not found: {path!r} — expected a Gemini binary edge "
            f"file (consecutive uint32 src,dst pairs; see "
            f"tools/generate_dataset.py to create one)")
    raw = np.fromfile(path, dtype="<u4")
    if raw.size % 2 != 0:
        raise ValueError(f"edge file {path} has odd word count {raw.size}")
    edges = raw.reshape(-1, 2)
    # validate on the RAW uint32 words: ids >= 2^31 would wrap negative
    # after the int32 cast and silently bypass a post-cast range check
    # (then crash bincount or index out of bounds in the native path)
    if num_vertices is not None and edges.size and \
            int(edges.max()) >= num_vertices:
        raise ValueError(
            f"edge file {path} references vertex {int(edges.max())} >= "
            f"VERTICES={num_vertices}")
    src = edges[:, 0].astype(np.int32)
    dst = edges[:, 1].astype(np.int32)
    return src, dst


def write_edge_file(path: str, src: np.ndarray, dst: np.ndarray) -> None:
    """Write the Gemini binary format (for tests / dataset prep)."""
    edges = np.stack([src.astype("<u4"), dst.astype("<u4")], axis=1)
    edges.tofile(path)


def read_features(path: str, num_vertices: int, feature_dim: int) -> np.ndarray:
    """Text feature table ``id f...`` → float32 [V, F]."""
    out = np.zeros((num_vertices, feature_dim), dtype=np.float32)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            vid = int(parts[0])
            out[vid] = np.asarray(parts[1:1 + feature_dim], dtype=np.float32)
    return out


def read_labels(path: str, num_vertices: int) -> np.ndarray:
    """Text label table ``id label`` → int32 [V]."""
    out = np.zeros(num_vertices, dtype=np.int32)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[int(parts[0])] = int(parts[1])
    return out


def read_masks(path: str, num_vertices: int) -> np.ndarray:
    """Text mask table ``id train|val|test`` → int32 [V] (train=0/val=1/test=2)."""
    out = np.zeros(num_vertices, dtype=np.int32)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[int(parts[0])] = _MASK_ENCODING[parts[1].lower()]
    return out


def read_features_csv(path: str, num_vertices: int, feature_dim: int
                      ) -> np.ndarray:
    """OGB-style comma-separated feature rows, row i = vertex i
    (ref: core/ntsDataloador.hpp readFeature_Label_Mask_OGB:232-305)."""
    out = np.loadtxt(path, delimiter=",", dtype=np.float32, ndmin=2)
    if out.shape != (num_vertices, feature_dim):
        raise ValueError(f"feature csv shape {out.shape} != "
                         f"({num_vertices},{feature_dim})")
    return out


def read_labels_csv(path: str, num_vertices: int) -> np.ndarray:
    """OGB-style one-label-per-line csv."""
    out = np.loadtxt(path, delimiter=",", dtype=np.int64, ndmin=1)
    return out.reshape(-1)[:num_vertices].astype(np.int32)


def read_masks_ogb(split_dir: str, num_vertices: int) -> np.ndarray:
    """OGB split dir with train.csv / valid.csv / test.csv of vertex ids
    (ref: core/ntsDataloador.hpp:267-305)."""
    out = np.full(num_vertices, MASK_TEST, dtype=np.int32)
    import os
    for fname, code in (("train.csv", MASK_TRAIN), ("valid.csv", MASK_VAL),
                        ("test.csv", MASK_TEST)):
        fp = os.path.join(split_dir, fname)
        ids = np.loadtxt(fp, delimiter=",", dtype=np.int64, ndmin=1)
        out[ids.astype(np.int64)] = code
    return out


def random_generate(num_vertices: int, feature_dim: int, num_classes: int,
                    seed: int = 0,
                    train_frac: float = 0.65, val_frac: float = 0.1,
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random features/labels/masks when FEATURE_FILE is "random"
    (ref: core/ntsDataloador.hpp GNNDatum::random_generate; GCN_CPU.hpp:92-94).
    """
    rng = np.random.default_rng(seed)
    feats = rng.random((num_vertices, feature_dim), dtype=np.float32)
    labels = rng.integers(0, num_classes, size=num_vertices).astype(np.int32)
    u = rng.random(num_vertices)
    masks = np.full(num_vertices, MASK_TEST, dtype=np.int32)
    masks[u < train_frac] = MASK_TRAIN
    masks[(u >= train_frac) & (u < train_frac + val_frac)] = MASK_VAL
    return feats, labels, masks
