"""Checkpoint save/restore (Orbax).

Port target: reference checkpoint dicts {epoch, step, best_loss, model/ema/
optimizer state dicts, hparams} written on best validation loss
(trainer.py:156-168, train_pgm.py:533-546, train_cf.py:516-529). The hparams
stored inside the checkpoint are authoritative on reload (main.py:31-36) —
``load_checkpoint`` returns the Config rebuilt from the stored JSON so the
DSCM merge step can reconstruct each mechanism purely from its checkpoint
(train_cf.py:303-364).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from causal_gen_tpu.config import Config
from causal_gen_tpu.train.state import TrainState


class AsyncCheckpointWriter:
    """Async checkpoint writer with rotation/GC and a best-pointer.

    TPU-native upgrade over the reference's blocking ``torch.save``-on-best
    (trainer.py:156-168): arrays are snapshotted to host, then serialization
    runs on orbax's background thread (``ocp.AsyncCheckpointer``) so the
    train loop returns to stepping immediately. Each save lands in
    ``<directory>/step_<n>``; checkpoints beyond ``max_to_keep`` are
    garbage-collected oldest-first, always retaining the best-metric one
    (lower is better, matching best-validation-ELBO retention). A
    ``<directory>/<link_name>`` symlink tracks the best checkpoint so the
    existing ``load_checkpoint(save_dir + "/checkpoint")`` call sites and the
    DSCM merge keep working unchanged.

    Generic over the payload (a pytree dict) + meta (JSON) so the HVAE, PGM,
    and CF trainers share one writer.
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        link_name: str = "checkpoint",
    ) -> None:
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max(1, int(max_to_keep))
        self.link_name = link_name
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        # entries ordered by save time: {"path", "step", "metric"}
        self._entries: List[Dict[str, Any]] = []

    # -- helpers ------------------------------------------------------------

    def _best(self) -> Optional[Dict[str, Any]]:
        scored = [e for e in self._entries if e["metric"] is not None]
        if scored:
            return min(scored, key=lambda e: e["metric"])
        return self._entries[-1] if self._entries else None

    def _gc(self) -> None:
        """Delete oldest checkpoints beyond max_to_keep (best is immune).

        Only called after wait_until_finished, so every entry is complete."""
        best = self._best()
        keep = set()
        if best is not None:
            keep.add(best["path"])
        for e in reversed(self._entries):  # newest first
            if len(keep) >= self.max_to_keep:
                break
            keep.add(e["path"])
        for e in list(self._entries):
            if e["path"] not in keep:
                shutil.rmtree(e["path"], ignore_errors=True)
                meta = e["path"] + ".meta.json"
                if os.path.exists(meta):
                    os.remove(meta)
                self._entries.remove(e)

    def _update_link(self) -> None:
        best = self._best()
        if best is None:
            return
        link = os.path.join(self.directory, self.link_name)
        # relative target: checkpoints stay loadable from clones/moves
        target = os.path.basename(best["path"])
        for suffix in ("", ".meta.json"):
            tmp = link + suffix + ".tmp"
            if os.path.lexists(tmp):
                os.remove(tmp)
            os.symlink(target + suffix, tmp)
            os.replace(tmp, link + suffix)

    # -- API ----------------------------------------------------------------

    def save(
        self,
        payload: Dict[str, Any],
        meta: Dict[str, Any],
        step: int,
        metric: Optional[float] = None,
    ) -> str:
        """Queue an async save; returns the checkpoint path immediately."""
        # serialize with any in-flight save, then GC completed ones
        self._ckptr.wait_until_finished()
        self._update_link()
        self._gc()
        path = os.path.join(self.directory, f"step_{int(step):010d}")
        payload = jax.device_get(payload)  # snapshot before donation reuse
        self._ckptr.save(path, args=ocp.args.PyTreeSave(payload), force=True)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
        self._entries.append(
            {"path": path, "step": int(step),
             "metric": None if metric is None else float(metric)}
        )
        with open(os.path.join(self.directory, "index.json"), "w") as f:
            json.dump({"entries": self._entries}, f, indent=2)
        return path

    def update_metric(self, metric: float, path: Optional[str] = None) -> None:
        """Attach/overwrite the retention metric of a queued save.

        Call sites that must persist BEFORE their validation metric exists
        (the CF trainer saves ahead of the long per-parent sweeps for
        crash-safety) feed the metric back here once computed, so
        best-checkpoint retention still matches the reference's
        save-on-best-valid-loss (train_cf.py:510-517). Defaults to the most
        recent save; refreshes the best pointer immediately."""
        target = self._entries[-1] if path is None else next(
            (e for e in self._entries if e["path"] == path), None
        )
        if target is None:
            return
        target["metric"] = float(metric)
        with open(os.path.join(self.directory, "index.json"), "w") as f:
            json.dump({"entries": self._entries}, f, indent=2)
        self._ckptr.wait_until_finished()
        self._update_link()

    def wait(self) -> None:
        """Block until all queued saves are durable; refresh best pointer."""
        self._ckptr.wait_until_finished()
        self._update_link()
        self._gc()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def repair_link(directory: str, link_name: str = "checkpoint") -> Optional[str]:
    """Re-point the best-checkpoint symlink after an abrupt kill.

    The async writer refreshes the link only on the NEXT save/wait, so a
    crash can leave it one save behind. This reads index.json, drops entries
    whose orbax commit marker is missing (incomplete writes), picks the best
    metric (falling back to newest), and atomically re-points the link.
    Returns the repaired target or None if nothing usable exists."""
    directory = os.path.abspath(directory)
    idx = os.path.join(directory, "index.json")
    if not os.path.exists(idx):
        return None
    with open(idx) as f:
        entries = json.load(f).get("entries", [])
    complete = [
        e for e in entries
        if os.path.isdir(e["path"]) and os.path.exists(e["path"] + ".meta.json")
        and any(
            os.path.exists(os.path.join(e["path"], m))
            for m in ("_CHECKPOINT_METADATA", "commit_success.txt", "manifest.ocdbt")
        )
    ]
    if not complete:
        return None
    scored = [e for e in complete if e.get("metric") is not None]
    best = min(scored, key=lambda e: e["metric"]) if scored else complete[-1]
    link = os.path.join(directory, link_name)
    target = os.path.basename(best["path"])
    for suffix in ("", ".meta.json"):
        tmp = link + suffix + ".tmp"
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(target + suffix, tmp)
        os.replace(tmp, link + suffix)
    return best["path"]


def state_payload(state: TrainState) -> Dict[str, Any]:
    """TrainState -> host-side checkpoint payload dict."""
    return {
        "params": jax.device_get(state.params),
        "ema_params": jax.device_get(state.ema_params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
        "ema_updates": int(jax.device_get(state.ema_updates)),
        "skipped": int(jax.device_get(state.skipped)),
    }


def save_checkpoint(
    path: str,
    cfg: Config,
    state: TrainState,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    path = os.path.abspath(path)
    payload = state_payload(state)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    meta = {"config": cfg.to_dict(), "extra": extra or {}}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(
    path: str, template_state: Optional[TrainState] = None
) -> Tuple[Config, TrainState, Dict[str, Any]]:
    """Returns (config-from-checkpoint, state, extra).

    Param trees are plain dicts and restore structurally as-is; the OPTIMIZER
    state is a tree of optax NamedTuples whose structure orbax cannot recover
    without a template — pass ``template_state`` (a freshly-initialized
    TrainState for the same config) when the optimizer state must survive
    (training resume). Without it, opt_state comes back as raw nested dicts
    (fine for inference / DSCM merge which only reads params/ema_params)."""
    path = os.path.abspath(path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    cfg = Config.from_dict(meta["config"])
    ckptr = ocp.PyTreeCheckpointer()
    if template_state is not None:
        item = {
            "params": jax.device_get(template_state.params),
            "ema_params": jax.device_get(template_state.ema_params),
            "opt_state": jax.device_get(template_state.opt_state),
            "step": 0,
            "ema_updates": 0,
            "skipped": 0,
        }
        payload = ckptr.restore(path, item=item)
    else:
        payload = ckptr.restore(path)
    import jax.numpy as jnp

    state = TrainState(
        step=jnp.asarray(payload["step"], jnp.int32),
        ema_updates=jnp.asarray(payload["ema_updates"], jnp.int32),
        params=payload["params"],
        ema_params=payload["ema_params"],
        opt_state=payload["opt_state"],
        skipped=jnp.asarray(payload.get("skipped", 0), jnp.int32),
    )
    return cfg, state, meta.get("extra", {})
