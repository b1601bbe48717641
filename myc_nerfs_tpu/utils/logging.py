"""Console logging + ETA timer + metric writers.

Re-implements barf-myc/util.py:55-92 (colored Log class, EMA-smoothed ETA
timer) and the reference's observability surface (SURVEY.md §5.5): plain-text
metric files (psnr.txt/quant.txt style) and optional TensorBoard scalars via
tensorboardX when present.
"""
from __future__ import annotations

import os
import sys
import time
from typing import Dict, Optional


def _c(text, color):
    codes = dict(red=31, green=32, yellow=33, blue=34, magenta=35, cyan=36)
    if not sys.stdout.isatty():
        return str(text)
    return f"\033[{codes[color]}m{text}\033[0m"


class Log:
    """Colored console logger (util.py:55-83)."""

    def process(self, pid):
        print(_c(f"Process ID: {pid}", "cyan"))

    def title(self, msg):
        print(_c(msg, "yellow"))

    def info(self, msg):
        print(_c(msg, "green"))

    def options(self, opt, level: int = 0):
        for k, v in sorted(opt.items()):
            if isinstance(v, dict):
                print("   " * level + _c(f"* {k}:", "blue"))
                self.options(v, level + 1)
            else:
                print("   " * level + _c(f"* {k}:", "blue"), v)

    def warning(self, msg):
        # keep the level greppable in piped/CI output where _c is a no-op
        print(_c(f"WARNING: {msg}", "magenta"))

    def error(self, msg):
        print(_c(f"ERROR: {msg}", "red"), file=sys.stderr)


log = Log()


class ETATimer:
    """EMA-smoothed iteration timer (util.py:85-92, base.py:96-115)."""

    def __init__(self, ema: float = 0.99):
        self.ema = ema
        self.it_mean: Optional[float] = None
        self._last = time.time()

    def update(self, it: int, max_it: int) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        self.it_mean = dt if self.it_mean is None else \
            self.ema * self.it_mean + (1 - self.ema) * dt
        return self.it_mean * (max_it - it)


class MetricWriter:
    """Append-only metric text files (psnr.txt / quant.txt style) + optional
    TensorBoard scalars."""

    def __init__(self, out_dir: str, use_tb: bool = False):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.tb = None
        if use_tb:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(out_dir)
            except ImportError:
                pass

    def scalar(self, name: str, value: float, step: int) -> None:
        safe = name.replace("/", "_")
        with open(os.path.join(self.out_dir, f"{safe}.txt"), "a") as f:
            f.write(f"{step} {value}\n")
        if self.tb is not None:
            self.tb.add_scalar(name, value, step)

    def quant_line(self, filename: str, *values) -> None:
        """quant.txt / quant_pose.txt rows (nerf.py:153-157, garf.py:224-228)."""
        with open(os.path.join(self.out_dir, filename), "a") as f:
            f.write(" ".join(str(v) for v in values) + "\n")
