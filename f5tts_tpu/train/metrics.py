"""Training metrics backends (parity with the reference's wandb/tensorboard
logging, ``model/trainer.py:68-94,330-334``): JSONL always works; wandb and
tensorboard are gated on availability and never required."""

from __future__ import annotations

import json
import time


class JsonlLogger:
    """Append one JSON object per log call; stdout mirror optional."""

    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._f = open(path, "a", buffering=1) if path else None

    def __call__(self, **metrics):
        rec = {"ts": round(time.time(), 3), **metrics}
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
        if self.echo:
            print(line, flush=True)

    def close(self):
        if self._f:
            self._f.close()


def make_logger(backend: str = "jsonl", run_name: str = "f5tpu", log_dir: str = "runs", resume_id: str | None = None):
    """'jsonl' | 'wandb' | 'tensorboard' -> callable(**metrics)."""
    if backend == "wandb":
        try:
            import wandb  # type: ignore

            run = wandb.init(project=run_name, id=resume_id, resume="allow" if resume_id else None)

            def log(**metrics):
                step = metrics.pop("step", None)
                run.log(metrics, step=step)

            return log
        except Exception:
            print("wandb unavailable; falling back to jsonl")
            return JsonlLogger(f"{log_dir}/{run_name}.jsonl")
    if backend == "tensorboard":
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            writer = SummaryWriter(log_dir=f"{log_dir}/{run_name}")

            def log(**metrics):
                step = int(metrics.pop("step", 0))
                for k, v in metrics.items():
                    if isinstance(v, (int, float)):
                        writer.add_scalar(k, v, step)

            return log
        except Exception:
            print("tensorboard unavailable; falling back to jsonl")
            return JsonlLogger(f"{log_dir}/{run_name}.jsonl")
    return JsonlLogger(None if backend == "stdout" else f"{log_dir}/{run_name}.jsonl")
