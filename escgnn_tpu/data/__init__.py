"""Data layer: graph containers, static-shape batching, datasets.

TPU-native replacement of the reference's PyG `Data`/`Batch` stack
(reference `batch.py`, `dataloader.py`, dataset modules): every batch is
padded to a static budget (`BatchSpec`) with validity masks so one XLA
compilation serves the whole dataset.
"""
