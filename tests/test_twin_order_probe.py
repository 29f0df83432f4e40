"""Unit tests for the shuffle-order attribution probe's order recorder
(tools/twin_order_probe.py): the stream it feeds run_ours must be the
stream a torch DataLoader with the twin's constructor arguments actually
produces — deterministic, a permutation every epoch, and advancing (the
shared generator chains across epochs)."""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from twin_order_probe import torch_batch_order  # noqa: E402


def test_order_is_deterministic_and_a_permutation():
    a = torch_batch_order(500, 25, 3, seed=1)
    b = torch_batch_order(500, 25, 3, seed=1)
    assert len(a) == 3 and all(len(e) == 20 for e in a)
    for ea, eb in zip(a, b):
        for ba, bb in zip(ea, eb):
            assert ba.shape == (25,)
            np.testing.assert_array_equal(ba, bb)
    for e in a:
        flat = np.sort(np.concatenate(e))
        np.testing.assert_array_equal(flat, np.arange(500))


def test_order_chains_across_epochs_and_seeds():
    a = torch_batch_order(500, 25, 2, seed=1)
    assert not np.array_equal(np.concatenate(a[0]), np.concatenate(a[1]))
    c = torch_batch_order(500, 25, 1, seed=2)
    assert not np.array_equal(np.concatenate(a[0]), np.concatenate(c[0]))
    # epoch e is NOT a fresh randperm from a re-seeded generator: the
    # loader's internal base_seed draw + prior epochs advance the stream,
    # which is exactly why the order must be recorded, not re-derived
    import torch
    g = torch.Generator()
    g.manual_seed(1)
    fresh = torch.randperm(500, generator=g).numpy()
    assert not np.array_equal(np.concatenate(a[0]), fresh)


def test_matches_reference_loader_construction():
    """The recorded index stream equals the stream of an actual data-bearing
    DataLoader built exactly like digital_twin_tiny.run_reference's mk()."""
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    n, bs, seed = 100, 25, 3
    xs = torch.arange(n * 2, dtype=torch.float32).reshape(n, 2)
    ys = torch.arange(n)
    g = torch.Generator()
    g.manual_seed(seed)
    loader = DataLoader(TensorDataset(xs, ys), batch_size=bs, shuffle=True,
                        generator=g)
    rec = torch_batch_order(n, bs, 2, seed=seed)
    for epoch in range(2):
        seen = [y.numpy().copy() for _, y in loader]
        for got, want in zip(rec[epoch], seen):
            np.testing.assert_array_equal(got, want)
