"""Experiment logging: file+console logger into <outdir>/<cfg_name>/ and a
running-average meter (re-design of reference utils/utils.py:125-183)."""
from __future__ import annotations

import logging
import time
from pathlib import Path


class AverageMeter:
    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, weight: int = 1):
        self.val = float(val)
        self.sum += float(val) * weight
        self.count += weight

    def value(self):
        return self.val

    def average(self):
        return self.sum / max(self.count, 1)


def create_logger(output_dir: str, cfg_name: str, phase: str = "train"):
    root = Path(output_dir)
    final = root / cfg_name
    final.mkdir(parents=True, exist_ok=True)
    log_file = final / "{}_{}_{}.log".format(
        cfg_name, time.strftime("%Y-%m-%d-%H-%M"), phase)
    logging.basicConfig(filename=str(log_file),
                        format="%(asctime)-15s %(message)s", force=True)
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.StreamHandler())
    return logger, str(final)


def print_loss_dict(loss: dict, save: str | None = None):
    s = "".join("{}: {:.6f}\n".format(k, loss[k]) for k in sorted(loss))
    print(s)
    if save is not None:
        with open(save, "w") as f:
            f.write(s)
