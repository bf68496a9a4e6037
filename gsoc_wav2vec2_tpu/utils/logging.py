"""Metric logging: wandb when available, JSONL file always.

The reference logs through wandb only (`/root/reference/src/main.py:262-274`,
`training_utils.py:7-20`) and falls over without it; here wandb is optional
(this image does not ship it) and a local JSONL stream is always written so
runs are inspectable offline.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: str, project: Optional[str] = None, config=None):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self._path, "a")
        self._wandb = None
        if project is not None:
            try:
                import wandb

                self._wandb = wandb.init(project=project, config=config)
            except Exception:
                self._wandb = None
        # the reference keyed checkpoint dirs on the wandb run id precisely
        # so successive runs never collide (`main.py:272-274`); without wandb
        # a timestamp+nonce id provides the same guarantee
        self._local_id = time.strftime("%Y%m%d-%H%M%S") + "-" + uuid.uuid4().hex[:6]

    @property
    def run_id(self) -> str:
        if self._wandb is not None:
            return self._wandb.id
        return self._local_id

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        record = {"ts": time.time(), **metrics}
        if step is not None:
            record["step"] = step
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
