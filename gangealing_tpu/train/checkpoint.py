"""Checkpointing: native (orbax) save/restore of the full train state, plus
torch-schema export/import for model-zoo compatibility.

Capability reference: train.py:22-28 (ckpt schema: g_ema, t, t_ema, t_optim,
t_sched, ll, ll_optim, ll_sched, args), download.py:32-38 (find_model
name-or-path resolution), train.py:218-253 (resume w/ G-only fallback and
start-iteration parsing).
"""

import os
from typing import Any, Dict

import numpy as np


def save_native(path: str, state: Dict[str, Any], g_params=None, args=None):
    """Save the full train state with orbax (exact resume incl. optimizer)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state}
    if g_params is not None:
        payload["g_ema"] = g_params
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if args is not None:
        import json
        with open(os.path.join(path, "train_args.json"), "w") as f:
            json.dump(args, f, indent=2, default=str)


def load_native(path: str, abstract_payload=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if abstract_payload is not None:
        return ckptr.restore(os.path.abspath(path), abstract_payload)
    return ckptr.restore(os.path.abspath(path))


def _export_adam_state(opt_state, params):
    """optax ScaleByAdamState -> torch.optim.Adam.state_dict() schema,
    using the parameters()-order key mapping (io/torch_import.py)."""
    import torch
    from gangealing_tpu.io.torch_import import learnable_key_order
    order = learnable_key_order(params)
    count = int(np.asarray(opt_state.count))
    state = {}
    for i, k in enumerate(order):
        state[i] = {
            "step": torch.tensor(float(count)),
            "exp_avg": torch.from_numpy(np.asarray(opt_state.mu[k])),
            "exp_avg_sq": torch.from_numpy(np.asarray(opt_state.nu[k])),
        }
    return {"state": state, "param_groups": [{
        "lr": 0.0, "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0,
        "amsgrad": False, "params": list(range(len(order)))}]}


def _export_sched_state(base_lr, iteration, anneal_psi, period, tm, decay):
    """State dict of the reference's DecayingCosineAnnealingWarmRestarts
    (utils/annealing.py:50-148) at a given training iteration, so our torch
    exports restore cleanly in the reference's resume path."""
    import math
    epoch = max(0.0, (iteration - anneal_psi) / period)
    t_0 = 1
    if epoch >= t_0:
        if tm == 1:
            t_cur = epoch % t_0
            n = int(epoch // t_0)
            t_i = t_0
        else:
            n = int(math.log(epoch / t_0 * (tm - 1) + 1, tm))
            t_cur = epoch - t_0 * (tm ** n - 1) / (tm - 1)
            t_i = t_0 * tm ** n
    else:
        t_i, t_cur, n = t_0, epoch, 0
    cur_decay = decay ** n
    lr = cur_decay * base_lr * (1 + math.cos(math.pi * t_cur / t_i)) / 2 \
        if iteration > anneal_psi else base_lr
    return {"T_0": t_0, "T_i": t_i, "T_mult": tm, "eta_min": 0,
            "decay": decay, "cur_decay": cur_decay, "base_lrs": [base_lr],
            "last_epoch": math.floor(epoch), "T_cur": t_cur,
            "_step_count": int(iteration), "_last_lr": [lr],
            "_get_lr_called_within_step": False}


def export_torch(path: str, state: Dict[str, Any], g_params, args=None,
                 include_optimizers: bool = True, train_cfg=None,
                 iteration: int = 0):
    """Write a reference-schema .pt checkpoint (train.py:22-28). Loadable by
    the reference code and by our importer; Adam moments are converted to
    the torch schema so resume is exact in either framework. The LR
    scheduler needs no state (ours is a pure function of the iteration,
    which resume recovers from the checkpoint filename)."""
    import torch

    def to_t(tree):
        return {k: torch.from_numpy(np.asarray(v)) for k, v in tree.items()}

    ckpt = {
        "g_ema": to_t(g_params),
        "t": to_t(state["t"]),
        "t_ema": to_t(state["t_ema"]),
        "ll": to_t(state["ll"]),
    }
    if include_optimizers and "t_opt" in state:
        # no silent fallback: a checkpoint quietly missing t_optim would
        # "resume" with zeroed Adam moments and corrupt training dynamics
        ckpt["t_optim"] = _export_adam_state(state["t_opt"], state["t"])
        ckpt["ll_optim"] = _export_adam_state(state["ll_opt"], state["ll"])
    if train_cfg is not None:
        ckpt["t_sched"] = _export_sched_state(
            train_cfg.stn_lr, iteration, train_cfg.anneal_psi,
            train_cfg.period, train_cfg.tm, train_cfg.decay)
        ckpt["ll_sched"] = _export_sched_state(
            train_cfg.ll_lr, iteration, train_cfg.anneal_psi,
            train_cfg.period, train_cfg.tm, train_cfg.decay)
    if args is not None:
        import argparse
        ns = argparse.Namespace(**args) if isinstance(args, dict) else args
        ckpt["args"] = ns
    torch.save(ckpt, path)


def latest_checkpoint(results_path: str):
    """Newest iteration-numbered .pt under <results>/checkpoints, or None.

    Preemption-safe relaunch: rerunning the same training command with
    --auto_resume picks up exactly where the last save left off (the
    reference relies on torchrun restarts + a manually passed --ckpt,
    README.md:27; this removes the manual step)."""
    import glob
    ckpt_dir = os.path.join(results_path, "checkpoints")
    best = None
    best_iter = -1
    for p in glob.glob(os.path.join(ckpt_dir, "*.pt")):
        stem = os.path.splitext(os.path.basename(p))[0]
        try:
            i = int(stem)
        except ValueError:
            continue
        if i > best_iter:
            best, best_iter = p, i
    return best


def parse_start_iter(ckpt_path: str) -> int:
    """Recover the start iteration from the checkpoint filename
    (train.py:245-253)."""
    name = os.path.basename(ckpt_path)
    if name.startswith("best_"):
        name = name[5:]
    stem = os.path.splitext(name)[0]
    try:
        return int(stem)
    except ValueError:
        return 0


def find_model(name_or_path: str) -> str:
    """Resolve a model name or path (download.py:32-38). In this offline
    environment, names resolve only against a local 'pretrained/' dir."""
    if os.path.exists(name_or_path):
        return name_or_path
    local = os.path.join("pretrained", f"{name_or_path}.pt")
    if os.path.exists(local):
        return local
    raise FileNotFoundError(
        f"checkpoint {name_or_path!r} not found (no network access; place "
        f"pretrained checkpoints under ./pretrained/)")
