"""Lifecycle callbacks — the §2.10 extension surface the stage registry
alone didn't cover.

The reference drives its mining loop through 18 Callback events plus a
CallbackWrapper fan-out and state-aware callbacks like EarlyStopping
(AutoPhraseX-main/autophrasex/callbacks.py:5-241).  The engine's analog
maps those onto its two lifecycle shapes:

- **pipeline stages** (declarative build_pipeline): begin/end plus
  per-stage begin/end — the analog of the reference's per-phase
  on_read_corpus_* / on_select_frequent_phrases_* events, generalized
  because the engine's phases are registry stages.
- **driver-side epochs** (iterative fits: k-means centroid training,
  boosting rounds): on_epoch_begin/end over a mutable ``state`` dict —
  the analog of on_epoch_* (callbacks.py:34-49).  A callback may set
  ``state['early_stop'] = True`` to stop the loop, which is exactly how
  the reference's EarlyStopping flips ``autophrase.early_stop``
  (callbacks.py:224-241).
"""

from __future__ import annotations

import logging


class Callback:
    # ---- pipeline lifecycle ----
    def begin(self):
        pass

    def end(self):
        pass

    def on_stage_begin(self, stage: str, params: dict):
        pass

    def on_stage_end(self, stage: str, ds):
        pass

    # ---- iterative-driver lifecycle ----
    def on_epoch_begin(self, epoch: int, state: dict):
        pass

    def on_epoch_end(self, epoch: int, state: dict):
        pass


class CallbackList(Callback):
    """Fan-out wrapper (reference CallbackWrapper, callbacks.py:62-120)."""

    def __init__(self, callbacks=None):
        self.callbacks = list(callbacks or [])

    def begin(self):
        for cb in self.callbacks:
            cb.begin()

    def end(self):
        for cb in self.callbacks:
            cb.end()

    def on_stage_begin(self, stage, params):
        for cb in self.callbacks:
            cb.on_stage_begin(stage, params)

    def on_stage_end(self, stage, ds):
        for cb in self.callbacks:
            cb.on_stage_end(stage, ds)

    def on_epoch_begin(self, epoch, state):
        for cb in self.callbacks:
            cb.on_epoch_begin(epoch, state)

    def on_epoch_end(self, epoch, state):
        for cb in self.callbacks:
            cb.on_epoch_end(epoch, state)


class LoggingCallback(Callback):
    """Reference LoggingCallback analog: log each lifecycle transition."""

    def __init__(self, logger=None):
        self.log = logger or logging.getLogger("deepkg_ray")

    def begin(self):
        self.log.info("pipeline begin")

    def end(self):
        self.log.info("pipeline end")

    def on_stage_begin(self, stage, params):
        self.log.info("stage %s begin (%s)", stage, params)

    def on_stage_end(self, stage, ds):
        self.log.info("stage %s end", stage)

    def on_epoch_begin(self, epoch, state):
        self.log.info("epoch %d begin", epoch)

    def on_epoch_end(self, epoch, state):
        self.log.info("epoch %d end: %s",
                      epoch, {k: v for k, v in state.items()
                              if isinstance(v, (int, float, bool, str))})


class ThresholdScheduler(Callback):
    """Per-epoch threshold hook — the reference's ConstantThresholdScheduler
    slot (AutoPhraseX callbacks.py:212-221; a pass-stub there).  Here it
    actually works: writes ``state['threshold']`` at every epoch begin,
    either a constant or ``schedule(epoch)``."""

    def __init__(self, threshold: float = 0.45, schedule=None):
        self.threshold = threshold
        self.schedule = schedule

    def on_epoch_begin(self, epoch, state):
        state["threshold"] = (self.schedule(epoch) if self.schedule
                              else self.threshold)


class EarlyStopping(Callback):
    """Stop the epoch loop once the monitored state metric improves by less
    than min_delta for `patience` consecutive epochs (reference semantics,
    callbacks.py:224-241: pool growth below min_delta decrements patience;
    at zero it flips the driver's early_stop flag)."""

    def __init__(self, monitor: str, patience: int = 1,
                 min_delta: float = 1e-4):
        self.monitor = monitor
        self.patience = patience
        self.min_delta = min_delta
        self._prev: float | None = None

    def on_epoch_end(self, epoch, state):
        cur = float(state[self.monitor])
        if self._prev is not None and abs(cur - self._prev) < self.min_delta:
            self.patience -= 1
            if self.patience <= 0:
                state["early_stop"] = True
        self._prev = cur


def run_epochs(n_epochs: int, body, state: dict | None = None,
               callbacks: Callback | list | None = None) -> dict:
    """Drive an iterative fit with callbacks: body(epoch, state) runs once
    per epoch; callbacks may set state['early_stop'] to end the loop."""
    state = state if state is not None else {}
    cbs = callbacks if isinstance(callbacks, Callback) else CallbackList(callbacks)
    for epoch in range(n_epochs):
        cbs.on_epoch_begin(epoch, state)
        body(epoch, state)
        cbs.on_epoch_end(epoch, state)
        if state.get("early_stop"):
            break
    return state
