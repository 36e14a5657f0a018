"""Config parsing: the reference's ``KEY:value`` cfg format.

Re-creates ``InputInfo`` / ``readFromCfgFile`` (ref: core/GraphSegment.h:148-179,
core/GraphSegment.cpp:222-292) with the exact same keys, so a user of the
reference can point this framework at their existing ``*.cfg`` files.

Engine switches that were CPU/CUDA-specific in the reference (PROC_CUDA,
LOCK_FREE, OPTIM_KERNEL) are accepted for compatibility; on TPU they map to
backend selection (``kernel`` = pallas vs xla) or are no-ops.
"""

from __future__ import annotations

import dataclasses
from typing import List


@dataclasses.dataclass
class InputInfo:
    """All run configuration. Field-for-field parity with the reference's
    InputInfo (core/GraphSegment.h:148-179), plus TPU-specific extensions."""

    algorithm: str = ""
    vertices: int = 0
    epochs: int = 10
    layer_string: str = ""
    fanout_string: str = ""
    edge_file: str = ""
    feature_file: str = ""
    label_file: str = ""
    mask_file: str = ""
    overlap: bool = False          # PROC_OVERLAP: comm/compute pipelining
    process_local: bool = False    # PROC_LOCAL (hybrid local processing)
    with_cuda: bool = False        # PROC_CUDA — accepted, unused on TPU
    repthreshold: int = 0          # PROC_REP: DepCache replication threshold
    lock_free: bool = True         # LOCK_FREE — no-op on TPU (static index maps)
    optim_kernel_enable: bool = True  # OPTIM_KERNEL → use pallas kernels
    learn_rate: float = 0.01
    weight_decay: float = 0.05
    decay_rate: float = 0.97
    decay_epoch: float = -1
    drop_rate: float = 0.0
    batch_size: int = 64
    # --- TPU-native extensions (unknown keys in the reference printed
    # "not supported configure"; here they are first-class) ---
    kernel_backend: str = "auto"   # KERNEL_BACKEND: auto|xla|pallas
    num_partitions: int = 1        # NUM_PARTITIONS: mesh size for dist runs
    dtype: str = "float32"         # DTYPE: float32|bfloat16 compute dtype
    seed: int = 2026               # SEED
    checkpoint_path: str = ""      # CHECKPOINT_PATH: save/resume location
    checkpoint_every: int = 0      # CHECKPOINT_EVERY: epochs between saves
    cache_refresh: int = 1         # CACHE_REFRESH: epochs between DepCache
                                   # hot-block refreshes (1 = always fresh)
    shuffle_vertices: bool = False  # SHUFFLE_VERTICES: relabel randomly to
                                    # balance per-pair mirror counts (dist)
    rep_mode: str = "degree"        # REP_MODE: degree | multiplicity | auto
    sampler_backend: str = "host"   # SAMPLER: host (C++ reservoir, exact
                                    # reference semantics) | device (on-TPU,
                                    # fused into the train step)
    exchange: str = "uniform"       # EXCHANGE: uniform (one all_to_all,
                                    # global max pad) | ring (P-1 ppermutes
                                    # with exact per-step sizes — less
                                    # volume on skewed graphs, P7 order)
    fuse_epochs: int = 1            # FUSE_EPOCHS: full-graph epochs fused
                                    # per device dispatch (lax.scan) — big
                                    # win on small graphs where the per-call
                                    # round trip dominates
    profile_dir: str = ""           # PROFILE_DIR: write a jax profiler
                                    # trace of the run (the reference's
                                    # DEBUGINFO/timers, SURVEY.md §5, as
                                    # first-class tracing)
    tp_dim: int = 1                 # TP_DIM: feature-parallel mesh width f
                                    # (2-D vertex x feature parallelism;
                                    # mesh = NUM_PARTITIONS x TP_DIM devices;
                                    # no reference counterpart — the
                                    # reference is 1-D vertex-partitioned)
    debuginfo: bool = False         # DEBUGINFO: print the end-of-run
                                    # breakdown (the reference's DEBUGINFO()
                                    # phase table, toolkits/GCN.hpp:308-353)
    optimizer: str = "adam"         # OPTIMIZER: adam (reference default,
                                    # learnC2C_with_decay_Adam) | sgd
                                    # (learnC2C_with_decay_SGD — the
                                    # Parameter class's other variant)
    partition_mode: str = "range"   # PARTITION: range (reference's
                                    # contiguous locality-aware split) |
                                    # fennel (streaming edge-locality
                                    # partitioner + relabel — cuts mirror
                                    # sets on clustered graphs; beyond-
                                    # reference)
    eval_mode: bool = False         # EVAL_MODE: per-epoch accuracies from
                                    # an eval-mode forward (no dropout,
                                    # running BN stats) instead of the
                                    # reference's Test()-on-training-outputs
                                    # quirk (GCN_CPU.hpp:142-171); costs a
                                    # second forward per epoch
    gather_budget_mb: int = 0       # GATHER_BUDGET_MB: slab gather block
                                    # budget (0 = 128 MB default; env
                                    # NSL_GATHER_BUDGET_MB overrides)
    gated_chunk_mb: int = 0         # GATED_CHUNK_MB: score-tensor bytes
                                    # above which the gated op switches to
                                    # the chunked pipeline (0 = 1024 MB
                                    # default; env NSL_GATED_CHUNK_MB
                                    # overrides)
    feature_norm: bool = False      # FEATURE_NORM: per-feature
                                    # standardization of the loaded table
                                    # ((x-mean)/std at load; ours — the
                                    # reference trains on raw features).
                                    # The fix for bn-less models on
                                    # unnormalized real features.
    num_heads: int = 1              # NUM_HEADS: multi-head attention for
                                    # GAT (hidden layers split F_out into H
                                    # heads over ONE shared dep exchange,
                                    # concat; last layer single-head). Ours
                                    # — the reference GAT is single-head.
    resume: bool = False            # RESUME: restore CHECKPOINT_PATH
                                    # before training and continue from the
                                    # saved epoch (fresh start if absent) —
                                    # the crash-recovery surface; with
                                    # EPOCHS <= saved epoch it trains 0
                                    # epochs (pure-inference launch)
    predict_out: str = ""           # PREDICT_OUT: after the run, write
                                    # predict() logits (eval-mode forward,
                                    # user vertex order) to this .npy —
                                    # the serving/inference surface
    sample_rescale: bool = False    # SAMPLE_RESCALE: scale each sampled
                                    # edge's norm weight by deg_in/k_sampled
                                    # so the fanout-capped aggregate is an
                                    # UNBIASED estimate of the full-graph
                                    # one. Default off = reference parity
                                    # (MiniBatchFuseOp uses raw global-
                                    # degree norms, which attenuate the
                                    # aggregate by k/deg — at deg>>fanout
                                    # the logits freeze; measured r5 at
                                    # deg 1600: loss pinned at ln(C)
                                    # without this, converges with it).
    sage_pool_dim: int = 0          # SAGE_POOL_DIM: width of SAGE's
                                    # pooled representation (w_pool:
                                    # [F_in, P]). 0 = square [F_in, F_in]
                                    # (the original semantics). The pooled
                                    # table is what the extremal slab
                                    # gathers traverse, so P <= 128 keeps
                                    # those passes at one 128-lane tile
                                    # (the r4-late per-tile law) — at
                                    # F_in=602 the square pool pays 5
                                    # tiles/slot. Ours (the reference has
                                    # no SAGE family).
    hoist_l0: bool = False          # HOIST_L0: precompute layer 0's
                                    # neighbor aggregate A·X once (X is
                                    # constant and the aggregate is linear,
                                    # so (A·X)W == A·(XW) exactly) — removes
                                    # the widest gather AND, in dist runs,
                                    # the layer-0 exchange from every epoch.
                                    # Exact for GCN/GIN/COMMNET (param-free
                                    # layer-0 aggregate); attention/gated/
                                    # pooling models reject it. Layer 0 is
                                    # pinned to the standard (aggregate-
                                    # first) op order; EAGER keeps its
                                    # cheaper order for layers >= 1.

    @property
    def layer_sizes(self) -> List[int]:
        """Parse "1433-128-7" → [1433, 128, 7] (ref: graph.hpp:302-336)."""
        if not self.layer_string:
            return []
        return [int(s) for s in self.layer_string.split("-")]

    @property
    def fanout(self) -> List[int]:
        """Parse "5-10-10" → [5, 10, 10] (per-hop sample fanouts)."""
        if not self.fanout_string:
            return []
        return [int(s) for s in self.fanout_string.split("-")]

    @classmethod
    def from_cfg_file(cls, path: str) -> "InputInfo":
        """Parse the reference's KEY:value cfg file format
        (ref: core/GraphSegment.cpp:222-292)."""
        info = cls()
        with open(path, "r") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or ":" not in line:
                    continue
                key, _, val = line.partition(":")
                info._set_key(key.strip(), val.strip())
        return info

    def _set_key(self, key: str, val: str) -> None:
        flag = lambda v: v == "1" or v.lower() == "true"  # noqa: E731
        dispatch = {
            "ALGORITHM": lambda: setattr(self, "algorithm", val),
            "VERTICES": lambda: setattr(self, "vertices", int(val)),
            "EPOCHS": lambda: setattr(self, "epochs", int(val)),
            "LAYERS": lambda: setattr(self, "layer_string", val),
            "FANOUT": lambda: setattr(self, "fanout_string", val),
            "EDGE_FILE": lambda: setattr(self, "edge_file", val),
            "FEATURE_FILE": lambda: setattr(self, "feature_file", val),
            "LABEL_FILE": lambda: setattr(self, "label_file", val),
            "MASK_FILE": lambda: setattr(self, "mask_file", val),
            "PROC_OVERLAP": lambda: setattr(self, "overlap", flag(val)),
            "PROC_LOCAL": lambda: setattr(self, "process_local", flag(val)),
            "PROC_CUDA": lambda: setattr(self, "with_cuda", flag(val)),
            "PROC_REP": lambda: setattr(self, "repthreshold", int(val)),
            "LOCK_FREE": lambda: setattr(self, "lock_free", flag(val)),
            "OPTIM_KERNEL": lambda: setattr(self, "optim_kernel_enable", flag(val)),
            "LEARN_RATE": lambda: setattr(self, "learn_rate", float(val)),
            "WEIGHT_DECAY": lambda: setattr(self, "weight_decay", float(val)),
            "DECAY_RATE": lambda: setattr(self, "decay_rate", float(val)),
            "DECAY_EPOCH": lambda: setattr(self, "decay_epoch", float(val)),
            "DROP_RATE": lambda: setattr(self, "drop_rate", float(val)),
            "BATCH_SIZE": lambda: setattr(self, "batch_size", int(val)),
            "KERNEL_BACKEND": lambda: setattr(self, "kernel_backend", val),
            "NUM_PARTITIONS": lambda: setattr(self, "num_partitions", int(val)),
            "DTYPE": lambda: setattr(self, "dtype", val),
            "SEED": lambda: setattr(self, "seed", int(val)),
            "CHECKPOINT_PATH": lambda: setattr(self, "checkpoint_path", val),
            "CHECKPOINT_EVERY": lambda: setattr(self, "checkpoint_every",
                                                int(val)),
            "CACHE_REFRESH": lambda: setattr(self, "cache_refresh", int(val)),
            "SHUFFLE_VERTICES": lambda: setattr(self, "shuffle_vertices",
                                                flag(val)),
            "REP_MODE": lambda: setattr(self, "rep_mode", val),
            "SAMPLER": lambda: setattr(self, "sampler_backend", val),
            "EXCHANGE": lambda: setattr(self, "exchange", val),
            "FUSE_EPOCHS": lambda: setattr(self, "fuse_epochs", int(val)),
            "PROFILE_DIR": lambda: setattr(self, "profile_dir", val),
            "TP_DIM": lambda: setattr(self, "tp_dim", int(val)),
            "DEBUGINFO": lambda: setattr(self, "debuginfo", flag(val)),
            "PARTITION": lambda: setattr(self, "partition_mode", val),
            "OPTIMIZER": lambda: setattr(self, "optimizer", val),
            "EVAL_MODE": lambda: setattr(self, "eval_mode", flag(val)),
            "GATHER_BUDGET_MB": lambda: setattr(self, "gather_budget_mb",
                                                int(val)),
            "GATED_CHUNK_MB": lambda: setattr(self, "gated_chunk_mb",
                                              int(val)),
            "HOIST_L0": lambda: setattr(self, "hoist_l0", flag(val)),
            "FEATURE_NORM": lambda: setattr(self, "feature_norm",
                                            flag(val)),
            "NUM_HEADS": lambda: setattr(self, "num_heads", int(val)),
            "SAGE_POOL_DIM": lambda: setattr(self, "sage_pool_dim",
                                             int(val)),
            "SAMPLE_RESCALE": lambda: setattr(self, "sample_rescale",
                                              flag(val)),
            "RESUME": lambda: setattr(self, "resume", flag(val)),
            "PREDICT_OUT": lambda: setattr(self, "predict_out", val),
        }
        fn = dispatch.get(key)
        if fn is None:
            print(f"not supported configure: {key}")
        else:
            fn()

    def print(self) -> None:
        """Config dump, same spirit as InputInfo::print
        (ref: core/GraphSegment.cpp:294-318)."""
        for f in dataclasses.fields(self):
            print(f"{f.name}\t:\t{getattr(self, f.name)}")
        print("------------------input info--------------")
