#!/usr/bin/env python
"""Dataset statistics printer.

Capability mirror of reference `kernel/statistics.py:4-20`: per-dataset
graph count, mean nodes, mean (undirected) edges, feature width, class
count. Works on any loader that yields GraphData lists; by default prints
the in-repo synthetic/real datasets that need no external blobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def print_dataset(name: str, graphs) -> None:
    n_graphs = len(graphs)
    nodes = sum(g.num_nodes for g in graphs)
    edges = sum(g.num_edges for g in graphs)
    g0 = graphs[0]
    feats = 0 if g0.x is None else (1 if g0.x.ndim == 1 else g0.x.shape[1])
    ys = [np.asarray(g.y).reshape(-1) for g in graphs if g.y is not None]
    classes = "-"
    if ys and np.issubdtype(ys[0].dtype, np.integer):
        classes = len(np.unique(np.concatenate(ys)))
    print(f"Name     {name}")
    print(f"Graphs   {n_graphs}")
    print(f"Nodes    {nodes / n_graphs:.2f}")
    print(f"Edges    {edges / 2 / n_graphs:.2f}")
    print(f"Features {feats}")
    print(f"Classes  {classes}")
    print()


def main(names):
    from escgnn_tpu.data.counting import (
        CountingDatasetConfig,
        generate_counting_graphs,
    )
    from escgnn_tpu.data.molecules import synthetic_zinc
    from escgnn_tpu.data.tu import get_tu_dataset

    registry = {
        "count_cycle": lambda: generate_counting_graphs(
            CountingDatasetConfig(num_graphs=200)
        )["train"],
        "zinc-synthetic": lambda: synthetic_zinc(num_graphs=200),
        "tu-synthetic": lambda: get_tu_dataset(
            "SYN", root="/nonexistent", synthetic_fallback=True
        ),
    }
    for name in names or registry:
        if name not in registry:
            print(f"unknown dataset {name!r}; known: {sorted(registry)}")
            continue
        print_dataset(name, registry[name]())


if __name__ == "__main__":
    main(sys.argv[1:])
