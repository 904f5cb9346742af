"""Solver-state checkpointing: save/resume long reconstructions.

The reference only supports coarse resume through `run_method(value_init=…)`
warm starts plus end-of-run `np.save` of the result
(/root/reference/surfh/Simulation/fusion_CT.py:122-127,
scripts/main_fusion.py:196-205).  Here checkpoints carry the iterate, the
accumulated gradient-norm/criterion telemetry and the iteration counter, so
an interrupted run resumes exactly where it stopped.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .cg import SolverResult


def save_checkpoint(
    path: str, x, n_iter_done: int, grad_norm=None, crit_val=None, state=None
) -> None:
    tmp = path + ".tmp"
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    payload = dict(
        x=np.asarray(x),
        n_iter_done=int(n_iter_done),
        grad_norm=np.asarray(grad_norm if grad_norm is not None else []),
        crit_val=np.asarray(crit_val if crit_val is not None else []),
    )
    if state is not None:
        for i, s in enumerate(state):
            payload[f"state_{i}"] = np.asarray(s)
        payload["n_state"] = len(state)
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns dict(x, n_iter_done, grad_norm, crit_val[, state]) or None."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        out = dict(
            x=z["x"],
            n_iter_done=int(z["n_iter_done"]),
            grad_norm=z["grad_norm"],
            crit_val=z["crit_val"],
        )
        if "n_state" in z:
            out["state"] = tuple(z[f"state_{i}"] for i in range(int(z["n_state"])))
        return out


def run_checkpointed(
    criterion,
    method: str = "lcg",
    niter: int = 100,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    value_init=0.5,
    tolerance: float = 1e-12,
) -> SolverResult:
    """Drive `criterion.run_method` in segments, saving a checkpoint after
    each segment.  Resumes automatically if the checkpoint file already
    exists.  For `lcg` the FULL solver state (x, r, z, p, rz) is carried, so
    segmented runs are mathematically identical to an uninterrupted solve;
    other methods resume by warm start."""
    done = 0
    grad_hist: list = []
    x = value_init
    state = None
    if checkpoint_path:
        ck = load_checkpoint(checkpoint_path)
        if ck is not None and ck["n_iter_done"] > 0:
            done = min(ck["n_iter_done"], niter)
            x = ck["x"]
            grad_hist = list(ck["grad_norm"])
            state = ck.get("state")

    seg = checkpoint_every if (checkpoint_path and checkpoint_every > 0) else niter
    exact = method == "lcg"
    res = None
    while done < niter:
        step = min(seg, niter - done)
        kwargs = dict(maximum_iterations=step, tolerance=tolerance, value_init=x)
        if exact:
            kwargs.update(solver_state=state, return_state=True)
        res = criterion.run_method(method, **kwargs)
        x = res.x
        state = res.state
        done += res.n_iter if res.n_iter > 0 else step
        grad_hist.extend(res.grad_norm.tolist())
        if checkpoint_path:
            save_checkpoint(checkpoint_path, x, done, grad_hist, state=state)
        if res.converged and res.n_iter < step:
            break
    if res is None:  # fully resumed run
        res = SolverResult(x=np.asarray(x), grad_norm=np.asarray(grad_hist), n_iter=done, converged=True)
    else:
        res = SolverResult(
            x=np.asarray(x),
            grad_norm=np.asarray(grad_hist),
            n_iter=done,
            converged=res.converged,
        )
    return res
