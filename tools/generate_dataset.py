"""Dataset preparation: convert graphs to the NTS on-disk format.

Re-creates data/generate_nts_dataset.py + data/OGBData/* of the reference
(SURVEY.md §2.8): emit the Gemini binary edge file (consecutive little-endian
uint32 (src,dst) pairs) with self loops inserted, plus the text
feature/label/mask tables the framework (and the reference) read.

Inputs supported:
  --edges FILE        text edge list "src dst" per line, or .npy [E,2]
  --synthetic SBM     built-in synthetic generator (SBM with labels/features)
  --from-dgl NAME     DGL dataset (cora/citeseer/pubmed/reddit) when the
                      dgl package + cached data exist (the image has no
                      network access: only pre-cached datasets work)
  --from-pyg NAME     torch_geometric Planetoid datasets, same caveat

Usage:
  python tools/generate_dataset.py --synthetic sbm --vertices 1000 \
      --classes 7 --feat-dim 64 --out data/sbm1000
  python tools/generate_dataset.py --edges raw.txt --vertices 2708 \
      --out data/mygraph
Outputs: <out>.edge.self (binary), <out>.featuretable, <out>.labeltable,
<out>.mask — drop-in for EDGE_FILE/FEATURE_FILE/LABEL_FILE/MASK_FILE.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neutronstarlite_tpu.graph.structure import add_self_loops  # noqa: E402


def write_nts(out, src, dst, feats, labels, masks, fmt=".6f"):
    v = feats.shape[0]
    src, dst = add_self_loops(src.astype(np.int32), dst.astype(np.int32), v)
    np.stack([src.astype("<u4"), dst.astype("<u4")], axis=1).tofile(
        out + ".edge.self")
    with open(out + ".featuretable", "w") as f:
        for i in range(v):
            f.write(f"{i} " + " ".join(format(x, fmt) for x in feats[i])
                    + "\n")
    with open(out + ".labeltable", "w") as f:
        for i in range(v):
            f.write(f"{i} {int(labels[i])}\n")
    names = {0: "train", 1: "val", 2: "test"}
    with open(out + ".mask", "w") as f:
        for i in range(v):
            f.write(f"{i} {names[int(masks[i])]}\n")
    print(f"wrote {out}.edge.self ({src.size} edges), .featuretable, "
          f".labeltable, .mask (V={v}, F={feats.shape[1]})")


def build_digits21k(seed: int = 7) -> dict:
    """Build the 22K augmented/noised digits dataset (see the --real
    digits21k comment in main for the design + measured baselines)."""
    from sklearn.datasets import load_digits
    from sklearn.neighbors import NearestNeighbors
    d = load_digits()
    x0 = d.data.astype(np.float32)
    y0 = d.target.astype(np.int32)
    v0 = x0.shape[0]
    rng = np.random.default_rng(seed)
    u = rng.random(v0)
    split = np.where(u < 0.55, 0, np.where(u < 0.70, 1, 2)).astype(np.int32)

    def shift(img, dy, dx):
        im = img.reshape(8, 8)
        out = np.zeros_like(im)
        ys = slice(max(dy, 0), 8 + min(dy, 0))
        yd = slice(max(-dy, 0), 8 + min(-dy, 0))
        xs = slice(max(dx, 0), 8 + min(dx, 0))
        xd = slice(max(-dx, 0), 8 + min(-dx, 0))
        out[yd, xd] = im[ys, xs]
        return out.reshape(-1)

    train_idx = np.nonzero(split == 0)[0]
    aug_feats, aug_labels = [], []
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1),
              (-1, -1), (-1, 1), (1, -1), (1, 1)]
    for (dy, dx) in shifts:
        for sn in (0.0, 1.5):
            f = np.stack([shift(x0[i], dy, dx) for i in train_idx])
            if sn:
                f = f + rng.normal(0, sn, f.shape)
            aug_feats.append(np.clip(f, 0, 16).astype(np.float32))
            aug_labels.append(y0[train_idx])
    for sn in (1.0, 2.0, 3.0, 1.5):
        f = x0[train_idx] + rng.normal(0, sn, (train_idx.size, 64))
        aug_feats.append(np.clip(f, 0, 16).astype(np.float32))
        aug_labels.append(y0[train_idx])

    feats = np.concatenate([x0] + aug_feats)
    labels = np.concatenate([y0] + aug_labels)
    masks = np.concatenate(
        [split] + [np.zeros(a.shape[0], np.int32) for a in aug_feats])
    # corrupt EVERY vertex's features (σ=4 on the 0..16 pixel scale): the
    # graph-free baselines drop (LR 0.878 → 0.770) while graph smoothing
    # over the kNN structure recovers most of it
    feats = np.clip(feats + rng.normal(0, 4.0, feats.shape),
                    0, 16).astype(np.float32)
    v = feats.shape[0]
    k = 8
    nn = NearestNeighbors(n_neighbors=k + 1).fit(feats)
    _, idx = nn.kneighbors(feats)
    src = np.repeat(np.arange(v, dtype=np.int32), k)
    dst = idx[:, 1:].reshape(-1).astype(np.int32)
    return {"src": np.concatenate([src, dst]),
            "dst": np.concatenate([dst, src]),
            "feats": feats, "labels": labels, "masks": masks}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges")
    ap.add_argument("--synthetic", choices=["sbm", "reddit_full"])
    ap.add_argument("--from-dgl")
    ap.add_argument("--from-pyg")
    ap.add_argument("--real", choices=["digits", "digits21k"],
                    help="real public dataset bundled offline "
                         "(sklearn digits → kNN graph; digits21k = the "
                         "22K-vertex noised/augmented variant with a "
                         "non-trivial accuracy bar)")
    ap.add_argument("--vertices", type=int, default=0)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--feat-dim", type=int, default=64)
    ap.add_argument("--avg-degree", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.synthetic == "reddit_full":
        # Reddit-full-scale power-law stand-in (V=232,965, avg deg 50 —
        # the reference's gcn_reddit_full.cfg scale; the real dataset is
        # not downloadable offline). Writes ONLY the binary edge file
        # (Gemini uint32-pair format); run with FEATURE_FILE:random.
        v, avg_deg = args.vertices or 232965, args.avg_degree or 50  # reddit-scale default
        rng = np.random.default_rng(args.seed)
        e = v * avg_deg
        w = (np.arange(1, v + 1) ** -0.8)
        w /= w.sum()
        dst = rng.choice(v, size=e, p=w).astype(np.int32)
        src = rng.integers(0, v, size=e).astype(np.int32)
        src, dst = add_self_loops(src, dst, v)
        np.stack([src.astype("<u4"), dst.astype("<u4")], axis=1).tofile(
            args.out if args.out.endswith(".edge") else args.out + ".edge")
        print(f"wrote {len(src)} edges (V={v})")
        return

    if args.synthetic == "sbm":
        from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
        d = synthetic_sbm_dataset(args.vertices or 1000, args.feat_dim,
                                  args.classes, avg_degree=args.avg_degree or 10,
                                  seed=args.seed)
        # recover an edge list from the forward ordering (self loops kept;
        # write_nts re-adds any missing)
        write_nts(args.out, d.graph.fwd_src, d.graph.fwd_dst, d.features,
                  d.labels, d.masks)
        return

    if args.edges:
        if args.edges.endswith(".npy"):
            e = np.load(args.edges)
            src, dst = e[:, 0], e[:, 1]
        else:
            e = np.loadtxt(args.edges, dtype=np.int64)
            src, dst = e[:, 0], e[:, 1]
        v = args.vertices or int(max(src.max(), dst.max()) + 1)
        rng = np.random.default_rng(args.seed)
        feats = rng.random((v, args.feat_dim), np.float32)
        labels = rng.integers(0, args.classes, v).astype(np.int32)
        u = rng.random(v)
        masks = np.where(u < 0.65, 0, np.where(u < 0.75, 1, 2)).astype(np.int32)
        write_nts(args.out, src, dst, feats, labels, masks)
        return

    if args.real == "digits":
        # UCI Optical Recognition of Handwritten Digits — a REAL public
        # dataset bundled with scikit-learn (no network needed): 1797
        # samples × 64 grayscale features, 10 classes. Graph = symmetrized
        # kNN in feature space (the standard way to put tabular data
        # through a GNN); a correct GCN reaches ≳0.9 test accuracy.
        from sklearn.datasets import load_digits
        from sklearn.neighbors import NearestNeighbors
        d = load_digits()
        x = d.data.astype(np.float32)
        y = d.target.astype(np.int32)
        v = x.shape[0]
        k = args.avg_degree if args.avg_degree != 10 else 8
        nn = NearestNeighbors(n_neighbors=k + 1).fit(x)
        _, idx = nn.kneighbors(x)
        src = np.repeat(np.arange(v, dtype=np.int32), k)
        dst = idx[:, 1:].reshape(-1).astype(np.int32)   # drop self column
        # symmetrize (GCN normalization expects both directions)
        src2 = np.concatenate([src, dst])
        dst2 = np.concatenate([dst, src])
        u = np.random.default_rng(args.seed).random(v)
        masks = np.where(u < 0.6, 0,
                         np.where(u < 0.8, 1, 2)).astype(np.int32)
        write_nts(args.out, src2, dst2, x, y, masks, fmt="g")
        return

    if args.real == "digits21k":
        # The HARDER offline-constructible real-feature dataset (VERDICT r2
        # item 8; the suggested 20newsgroups/covtype need network access —
        # documented in TODO.md). 22,017 vertices built from the UCI digits
        # originals: the 1,797 originals are split train/val/test FIRST
        # (no leakage), then ONLY the train originals are augmented (8
        # single-pixel shifts × {clean, σ=1.5 noise} + 4 noise-only
        # variants, all real image transforms); every vertex's features
        # are then corrupted with σ=4 pixel noise (clipped to the 0..16
        # range). Graph = symmetrized k=8 kNN on the NOISED features.
        # Measured baselines at this noise level (fixed seed 7): graph-free
        # logistic regression 0.770 test, k-NN majority vote 0.919 — so a
        # GNN clearing 0.90 demonstrates the GRAPH contributes, which the
        # tiny digits set (~0.99 near-unavoidable) could not show.
        data = build_digits21k(args.seed or 7)
        write_nts(args.out, data["src"], data["dst"], data["feats"],
                  data["labels"], data["masks"], fmt="g")
        return

    if args.from_pyg:
        from torch_geometric.datasets import Planetoid  # noqa: F401
        ds = Planetoid(root="/tmp/pyg", name=args.from_pyg)
        d = ds[0]
        src = d.edge_index[0].numpy()
        dst = d.edge_index[1].numpy()
        masks = np.full(d.num_nodes, 2, np.int32)
        masks[d.train_mask.numpy()] = 0
        masks[d.val_mask.numpy()] = 1
        write_nts(args.out, src, dst, d.x.numpy(), d.y.numpy(), masks)
        return

    if args.from_dgl:
        import dgl  # noqa: F401
        data = {"cora": dgl.data.CoraGraphDataset,
                "citeseer": dgl.data.CiteseerGraphDataset,
                "pubmed": dgl.data.PubmedGraphDataset,
                "reddit": dgl.data.RedditDataset}[args.from_dgl]()
        g = data[0]
        src, dst = (t.numpy() for t in g.edges())
        masks = np.full(g.num_nodes(), 2, np.int32)
        masks[g.ndata["train_mask"].numpy()] = 0
        masks[g.ndata["val_mask"].numpy()] = 1
        write_nts(args.out, src, dst, g.ndata["feat"].numpy(),
                  g.ndata["label"].numpy(), masks)
        return

    ap.error("one of --edges/--synthetic/--from-dgl/--from-pyg required")


if __name__ == "__main__":
    main()
