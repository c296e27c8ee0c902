"""Persistent experiment tracking: per-step metrics JSONL + TensorBoard.

The reference logs every step to wandb (reference:
scripts/training/train_llark.sh:33,43 `--report_to wandb`). The TPU-native
equivalent keeps the run's metric stream local and dependency-light:

  * `<output_dir>/metrics.jsonl` — one JSON object per logged step,
    append-mode + line-flushed, so a 100k-step run survives crashes and
    `--resume` continues the same file (each record carries its step).
  * optional TensorBoard event files under `<output_dir>/tb/` via
    `tensorboardX` when installed (`report_to="tensorboard"`); absent the
    package, the JSONL stream is still written and a single warning logged.

Only process 0 writes (multi-host: every host computes identical global
metrics, one copy is enough).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

log = logging.getLogger("llark_tpu.tracking")


class MetricsWriter:
    """Append-only metrics stream for a training run.

    `report_to`: "none" disables everything, "jsonl" writes the JSONL
    stream only, "tensorboard" writes JSONL + TB events (the JSONL file is
    the artifact of record either way, mirroring the reference's
    wandb-plus-stdout pairing).
    """

    def __init__(self, output_dir: str, report_to: str = "jsonl",
                 enabled: Optional[bool] = None):
        if enabled is None:
            try:
                import jax

                enabled = jax.process_index() == 0
            except Exception:
                enabled = True
        self.enabled = enabled and report_to != "none"
        self._fh = None
        self._tb = None
        self._t0 = time.time()
        if not self.enabled:
            return
        os.makedirs(output_dir, exist_ok=True)
        self._fh = open(os.path.join(output_dir, "metrics.jsonl"), "a", buffering=1)
        if report_to == "tensorboard":
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=os.path.join(output_dir, "tb"))
            except Exception as e:  # pragma: no cover - env without tbX
                log.warning("tensorboardX unavailable (%s); JSONL only", e)

    def log(self, step: int, **metrics: float) -> None:
        """Record scalar metrics for `step`. Values are coerced to float."""
        if not self.enabled:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update(clean)
        self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, global_step=step)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
