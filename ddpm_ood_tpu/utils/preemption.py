"""Preemption-graceful training (TPU-native operational concern).

Preemptible/spot TPU VMs get SIGTERM with a grace window before shutdown. The
reference's posture is fail-stop + manual resume (SURVEY §5: no elasticity);
here a SIGTERM instead finishes the CURRENT epoch, writes the standard
periodic checkpoint (`checkpoint_{epoch+1}`), and exits 0. Restarting the
same command resumes training: default discovery follows the reference
(base.py:133-158 — the rolling best `checkpoint` first, which can trail the
preemption epoch when the best train loss came earlier); resume AT the
preemption point deterministically with `--ddpm_checkpoint_epoch=<epoch+1>`
(the number is in the shutdown log line). Epoch-boundary semantics are
deliberate: no partial-epoch counters, no off-by-one in the resume epoch,
bit-identical training curve across the preemption.

Usage (both trainers):

    guard = PreemptionGuard().install()
    for epoch in ...:
        train_epoch(epoch)
        ...checkpointing...
        if guard.requested:
            save_checkpoint(f"checkpoint_{epoch + 1}", epoch, ...)
            break
"""

from __future__ import annotations

import signal

from .logging import info


class PreemptionGuard:
    def __init__(self):
        self.requested = False
        self._prev = {}

    def install(self, signals=(signal.SIGTERM,)) -> "PreemptionGuard":
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:
                pass  # not the main thread (tests drive trainers directly)
        return self

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except ValueError:
                pass
        self._prev.clear()

    def _handler(self, signum, frame):
        info(
            f"signal {signum}: finishing the current epoch, then "
            "checkpointing and exiting cleanly (preemption-graceful stop)"
        )
        self.requested = True


def checkpoint_if_preempted(guard: PreemptionGuard, trainer, epoch: int, args) -> bool:
    """Epoch-loop epilogue shared by both trainers: on a requested stop,
    write the standard periodic checkpoint (unless this epoch's periodic save
    just wrote the same name) and return True so the caller breaks."""
    if not guard.requested:
        return False
    if (epoch + 1) % args.checkpoint_every != 0:
        trainer.save_checkpoint(
            f"checkpoint_{epoch + 1}", epoch,
            f"Preempted: checkpointed epoch {epoch + 1}, exiting",
        )
    return True
