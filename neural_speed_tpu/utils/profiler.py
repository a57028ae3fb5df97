"""Timings + per-op profiling (parity: SURVEY.md §5 tracing).

* `Timings` — aggregate load/prefill/decode/sample timers and a
  `print_timings()` report, the analogue of `model_print_timings`
  (model_utils.cpp:1903-1925) with per-eval times kept like
  `model_context.eval_times` (model_types.h:309).
* `op_profile()` — context manager that captures a JAX device trace and
  prints a per-HLO-op time table, the analogue of the reference's per-op
  profile dump `ne_graph_profiling` (ne_layers.c:12030-12058), enabled by
  env `NEURAL_SPEED_VERBOSE=2` in the reference and honored here too via
  `verbose_level()`.
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


def verbose_level() -> int:
    """NEURAL_SPEED_VERBOSE parity (model_utils.h:52-62): -1 off, 0 timings,
    1 +generation config, 2 +per-op profile."""
    try:
        return int(os.environ.get("NEURAL_SPEED_VERBOSE", "-1"))
    except ValueError:
        return -1


@dataclass
class Timings:
    load_s: float = 0.0
    sample_s: float = 0.0
    sample_n: int = 0
    prefill_s: float = 0.0
    prefill_tokens: int = 0
    decode_s: float = 0.0
    decode_tokens: int = 0
    eval_times: List[float] = field(default_factory=list)  # per-eval seconds
    _t0: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def timer(self, kind: str, tokens: int = 1):
        tic = time.perf_counter()
        yield
        dt = time.perf_counter() - tic
        self.eval_times.append(dt)
        if kind == "load":
            self.load_s += dt
        elif kind == "prefill":
            self.prefill_s += dt
            self.prefill_tokens += tokens
        elif kind == "decode":
            self.decode_s += dt
            self.decode_tokens += tokens
        elif kind == "sample":
            self.sample_s += dt
            self.sample_n += tokens

    def print_timings(self, file=None) -> None:
        """model_print_timings-style report (model_utils.cpp:1903-1925)."""
        f = file or sys.stderr
        total = time.time() - self._t0
        p = self.prefill_tokens or 1
        d = self.decode_tokens or 1
        s = self.sample_n or 1
        print("\nnst_print_timings:", file=f)
        print(f"  load time    = {self.load_s*1e3:10.2f} ms", file=f)
        print(f"  sample time  = {self.sample_s*1e3:10.2f} ms / {self.sample_n}"
              f" runs ({self.sample_s*1e3/s:8.2f} ms per run)", file=f)
        print(f"  prefill time = {self.prefill_s*1e3:10.2f} ms / "
              f"{self.prefill_tokens} tokens "
              f"({self.prefill_s*1e3/p:8.2f} ms per token)", file=f)
        print(f"  decode time  = {self.decode_s*1e3:10.2f} ms / "
              f"{self.decode_tokens} tokens "
              f"({self.decode_s*1e3/d:8.2f} ms per token "
              f"= {d/max(self.decode_s,1e-9):.2f} tok/s)", file=f)
        print(f"  total time   = {total*1e3:10.2f} ms", file=f)


@contextlib.contextmanager
def op_profile(out=None, top: int = 30, trace_dir: Optional[str] = None):
    """Capture a device trace for the enclosed block and print a per-op
    table: total/self us, occurrences, HLO category + framework op.

    Per-op parity with NEURAL_SPEED_VERBOSE=2's graph profile dump.  Needs
    the `xprof` package to parse the trace (present in this image); if
    unavailable the trace directory path is printed instead.
    """
    import jax

    d = trace_dir or tempfile.mkdtemp(prefix="nst_trace_")
    with jax.profiler.trace(d):
        yield
    try:
        table = per_op_table(d, top=top)
    except Exception as exc:  # pragma: no cover
        print(f"[nst] trace captured at {d} (xprof parse failed: {exc})",
              file=out or sys.stderr)
        return
    f = out or sys.stderr
    print("\nper-op profile (self-time):", file=f)
    for row in table:
        print(f"  {row['self_us']:>10.1f}us ({row['pct']:5.1f}%) x"
              f"{row['occurrences']:<6} {row['category']:<22}"
              f" {row['op'][:70]}", file=f)


def per_op_table(trace_dir: str, top: int = 30) -> List[Dict]:
    """Parse an xplane trace into a per-op self-time table."""
    import glob
    import json

    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    d = json.loads(data) if isinstance(data, (str, bytes)) else data
    cols = [c["label"] for c in d["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in d["rows"]]
    total = sum(r.get("Total self time (us)") or 0 for r in rows) or 1.0
    rows.sort(key=lambda r: -(r.get("Total self time (us)") or 0))
    out = []
    for r in rows[:top]:
        self_us = r.get("Total self time (us)") or 0.0
        out.append({
            "self_us": self_us,
            "pct": 100.0 * self_us / total,
            "occurrences": int(r.get("#Occurrences") or 0),
            "category": str(r.get("HLO op category")),
            "op": str(r.get("Framework op name") or r.get("HLO op name")),
        })
    return out
