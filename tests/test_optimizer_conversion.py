"""Optimizer-state conversion validated against torch Adam as the oracle.

The reference resumes training with Adam moments preserved
(netinterface.py:405-448); tools/convert_reference_checkpoint.py maps
torch ``exp_avg``/``exp_avg_sq``/``step`` onto optax ``ScaleByAdamState``.
The decisive check: starting from a checkpoint taken after two torch Adam
steps, the NEXT update computed by optax on the converted state equals the
torch update exactly (same elementwise gradients on both sides).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from torch_ref_loader import load_reference_networks  # noqa: E402
from tools.convert_reference_checkpoint import (     # noqa: E402
    convert_model_nets, convert_model_optimizers, convert_state_dict)

LR, B1, B2 = 1e-3, 0.5, 0.9      # reference optim defaults


def _set_grads(net):
    """Deterministic elementwise gradients g = 0.01*sin(1000*p): an
    elementwise function of the weight commutes with the layout transforms
    (transposes/tap flips), so the same rule applies on the flax side."""
    for p in net.parameters():
        p.grad = 0.01 * torch.sin(1000.0 * p.detach())


def _np_grads(tree):
    import jax
    return jax.tree.map(
        lambda p: (0.01 * np.sin(1000.0 * np.asarray(p, np.float64)))
        .astype(np.float32), tree)


def _build_marrnet1_torch():
    _, ref_uresnet, _ = load_reference_networks()
    torch.manual_seed(0)
    tnet = ref_uresnet.Net([3, 1, 1], ["normal", "depth", "silhou"])
    # the exact decoder_minmax Sequential of models/marrnet1.py:141-154
    # (same construction as tests/test_torch_parity.py)
    tnet.decoder_minmax = torch.nn.Sequential(
        torch.nn.Conv2d(512, 512, 2, stride=2),
        torch.nn.Conv2d(512, 512, 4, stride=1),
        torch.nn.Flatten(),
        torch.nn.Linear(512, 256),
        torch.nn.BatchNorm1d(256),
        torch.nn.ReLU(inplace=True),
        torch.nn.Linear(256, 128),
        torch.nn.BatchNorm1d(128),
        torch.nn.ReLU(inplace=True),
        torch.nn.Linear(128, 2),
    )
    return tnet


def test_marrnet1_adam_resume_matches_torch():
    import optax

    tnet = _build_marrnet1_torch()
    opt = torch.optim.Adam(tnet.parameters(), lr=LR, betas=(B1, B2))
    for _ in range(2):
        opt.zero_grad()
        _set_grads(tnet)
        opt.step()

    payload = {"nets": [tnet.state_dict()],
               "optimizers": [opt.state_dict()], "epoch": 2}
    nets = [convert_state_dict(payload["nets"][0])]
    entries, _ = convert_model_nets("marrnet1", nets)
    opt_states, opt_names = convert_model_optimizers("marrnet1", payload,
                                                     nets)
    assert opt_names == ["net"]
    adam_state = opt_states[0][0]
    assert int(adam_state.count) == 2

    # torch takes the third step
    opt.zero_grad()
    _set_grads(tnet)
    opt.step()
    want_entries, _ = convert_model_nets(
        "marrnet1", [convert_state_dict(tnet.state_dict())])

    # optax takes the third step from the converted state
    params = entries[0]["params"]
    tx = optax.adam(LR, b1=B1, b2=B2)
    updates, _ = tx.update(_np_grads(params), opt_states[0], params)
    new_params = optax.apply_updates(params, updates)

    import jax
    flat_got = jax.tree.leaves(new_params)
    flat_want = jax.tree.leaves(want_entries[0]["params"])
    assert len(flat_got) == len(flat_want)
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=1e-7)


def test_wgangp_two_optimizers_convert():
    import jax

    ref_networks, _, _ = load_reference_networks()
    torch.manual_seed(1)
    g = ref_networks.VoxelGenerator(nz=8, nf=4, bias=False, res=128)
    d = ref_networks.VoxelDiscriminator(nf=4, bias=False, res=128)
    og = torch.optim.Adam(g.parameters(), lr=LR, betas=(B1, B2))
    od = torch.optim.Adam(d.parameters(), lr=LR, betas=(B1, B2))
    for net, o in ((g, og), (d, od)):
        o.zero_grad()
        _set_grads(net)
        o.step()

    payload = {"nets": [g.state_dict(), d.state_dict()],
               "optimizers": [og.state_dict(), od.state_dict()]}
    nets = [convert_state_dict(sd) for sd in payload["nets"]]
    entries, net_names = convert_model_nets("wgangp", nets)
    opt_states, opt_names = convert_model_optimizers("wgangp", payload, nets)
    assert net_names == ["net_g", "net_d"]
    assert opt_names == ["net_g", "net_d"]
    import optax
    for i in range(2):
        adam = opt_states[i][0]
        assert int(adam.count) == 1
        # moment trees mirror the converted param trees exactly
        ps = jax.tree.structure(entries[i]["params"])
        assert jax.tree.structure(adam.mu) == ps
        assert jax.tree.structure(adam.nu) == ps

    # update parity for both nets: torch takes step 2, optax must match
    for net, o in ((g, og), (d, od)):
        o.zero_grad()
        _set_grads(net)
        o.step()
    want_entries, _ = convert_model_nets(
        "wgangp", [convert_state_dict(g.state_dict()),
                   convert_state_dict(d.state_dict())])
    tx = optax.adam(LR, b1=B1, b2=B2)
    for i in range(2):
        params = entries[i]["params"]
        updates, _ = tx.update(_np_grads(params), opt_states[i], params)
        new_params = optax.apply_updates(params, updates)
        for got, want in zip(jax.tree.leaves(new_params),
                             jax.tree.leaves(want_entries[i]["params"])):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=1e-7)


def test_empty_optimizers_stay_empty():
    tnet = _build_marrnet1_torch()
    payload = {"nets": [tnet.state_dict()], "optimizers": []}
    nets = [convert_state_dict(payload["nets"][0])]
    opt_states, opt_names = convert_model_optimizers("marrnet1", payload,
                                                     nets)
    assert opt_states == [] and opt_names == []
