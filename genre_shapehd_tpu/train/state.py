"""Train state: one pytree carrying every net's variables + opt states.

Replaces the reference's NetInterface mutable object state
(/root/reference/models/netinterface.py:100-155, 405-448) with a single
immutable pytree that jitted train steps thread functionally.  Multi-net
models (wgangp, shapehd, genre) store one entry per net name; the optax
optimizers themselves are static objects owned by the model.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class ModelState:
    params: Dict[str, Any]        # net name -> params pytree
    batch_stats: Dict[str, Any]   # net name -> batch_stats pytree (may be {})
    opt_state: Dict[str, Any]     # optimizer name -> optax state
    step: jnp.ndarray             # global step counter
    extra: Dict[str, Any] = flax.struct.field(default_factory=dict)

    def variables(self, net: str) -> Dict[str, Any]:
        v = {"params": self.params[net]}
        if self.batch_stats.get(net):
            v["batch_stats"] = self.batch_stats[net]
        return v


def state_to_reference_payload(state: ModelState, net_names, opt_names,
                               epoch: int, loss_eval: float) -> Dict[str, Any]:
    """Pack a ModelState into the reference checkpoint layout."""
    return {
        "nets": [
            {"params": state.params[n], "batch_stats": state.batch_stats.get(n, {})}
            for n in net_names
        ],
        "optimizers": [state.opt_state[o] for o in opt_names],
        "epoch": epoch,
        "loss_eval": loss_eval,
        "extra": state.extra,
        "net_names": list(net_names),
        "opt_names": list(opt_names),
    }


def reference_payload_to_state(payload: Dict[str, Any],
                               template: ModelState) -> ModelState:
    """Restore a ModelState from a checkpoint payload, keeping the template's
    static structure (optimizer hyperparams stay current -- see
    core/checkpoint.py docstring)."""
    net_names = payload.get("net_names") or list(template.params)
    opt_names = payload.get("opt_names") or list(template.opt_state)
    params = dict(template.params)
    batch_stats = dict(template.batch_stats)
    for name, net in zip(net_names, payload["nets"]):
        params[name] = net["params"]
        if net.get("batch_stats"):
            batch_stats[name] = net["batch_stats"]
    opt_state = dict(template.opt_state)
    for name, os_ in zip(opt_names, payload["optimizers"]):
        opt_state[name] = os_
    return template.replace(params=params, batch_stats=batch_stats,
                            opt_state=opt_state,
                            extra=payload.get("extra", template.extra))
