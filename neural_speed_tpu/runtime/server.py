"""ModelServer: background worker thread + response callback.

Parity: the reference's `ModelServer` pybind class (main_pybind.cpp:150-323)
— a dedicated worker thread drains an issue queue into the continuous
batching scheduler and fires a user callback per finished request.  (The
GIL dance of the C++ version is just Python threading here.)
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Callable, List, Optional, Sequence

from ..ops.sampling import SamplingParams
from .scheduler import ContinuousBatchingScheduler
from .engine import Engine


class ModelServer:
    def __init__(
        self,
        engine: Engine,
        response_fn: Callable[[int, List[int]], None],
        sampling: Optional[SamplingParams] = None,
        eos_id: Optional[int] = None,
        max_new_tokens: int = 128,
        speculative: bool = False,
        spec_k: int = 7,
        num_beams: int = 1,
        beam_config=None,
        mixed_prefill: bool = False,
        mixed_chunk: int = 32,
        warmup: bool = False,
        window: Optional[int] = None,
    ):
        # beam requests run on the continuous beam scheduler (parity: the
        # reference server's do_early_stopping/num_beams query params,
        # main_pybind.cpp:150-323 + beam_search_flow::step)
        self._beam = num_beams > 1 or beam_config is not None
        if self._beam:
            from .beam import BeamConfig, BeamContinuousScheduler

            if speculative:
                raise ValueError(
                    "speculative serving does not compose with beam search")
            if mixed_prefill:
                raise ValueError(
                    "mixed_prefill does not compose with beam search")
            self._bc = beam_config or BeamConfig(
                num_beams=num_beams, max_new_tokens=max_new_tokens,
                eos_id=eos_id,
            )
            self.sched = BeamContinuousScheduler(engine, self._bc)
        else:
            self.sched = ContinuousBatchingScheduler(
                engine, sampling, eos_id, speculative=speculative,
                spec_k=spec_k, mixed_prefill=mixed_prefill,
                mixed_chunk=mixed_chunk, window=window,
            )
            if warmup:
                # prebuild the decode-chunk jit variants so the first real
                # request doesn't pay them (scheduler.warmup docstring)
                self.sched.warmup()
        self.response_fn = response_fn
        self.max_new_tokens = max_new_tokens
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._ckpt_path: Optional[str] = None
        self._ckpt_done = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # -- client API (parity: issueQuery, main_pybind.cpp:230) -----------
    def issue_query(self, prompt: Sequence[int],
                    max_new_tokens: Optional[int] = None) -> None:
        # None = no per-query override (the worker falls back to the
        # server default / the user's beam_config)
        self._queue.put((list(prompt), max_new_tokens))

    def join(self) -> None:
        """Block until all issued work is complete."""
        self._queue.join()
        while self.sched.has_work and self._err is None:
            threading.Event().wait(0.01)
        if self._err:
            raise self._err

    def save_state(self, path: str, timeout: Optional[float] = 60.0
                   ) -> None:
        """Checkpoint the live server between scheduler steps (a
        consistent point: no dispatch in flight).  Resume with
        `ContinuousBatchingScheduler.load_state` on a fresh engine +
        a new ModelServer wired to it (beam servers don't checkpoint)."""
        if self._beam:
            raise NotImplementedError(
                "beam serving has no checkpoint/resume yet")
        self._ckpt_done.clear()
        self._ckpt_path = path
        if not self._ckpt_done.wait(timeout):
            raise TimeoutError("server checkpoint did not complete")
        if self._err:
            raise self._err

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # -- worker (parity: main_pybind.cpp:167-226) ------------------------
    def _worker(self) -> None:
        try:
            while not self._stop.is_set():
                drained = False
                while True:
                    try:
                        prompt, mnt = self._queue.get_nowait()
                        if self._beam:
                            import dataclasses

                            bc = (self._bc if mnt is None else
                                  dataclasses.replace(
                                      self._bc, max_new_tokens=mnt))
                            self.sched.add_request(prompt, bc)
                        else:
                            self.sched.add_request(
                                prompt, mnt or self.max_new_tokens)
                        self._queue.task_done()
                        drained = True
                    except queue.Empty:
                        break
                if self._ckpt_path is not None:
                    # between steps: no dispatch in flight, state coherent
                    self.sched.save_state(self._ckpt_path)
                    self._ckpt_path = None
                    self._ckpt_done.set()
                if self.sched.has_work:
                    self.sched.step()
                    for seq in self.sched.pop_finished():
                        self.response_fn(seq.request_id, seq.generated)
                elif not drained:
                    self._stop.wait(0.005)
        except BaseException as e:  # surfaced on join()
            self._err = e
            traceback.print_exc()
