"""Asynchronous execution tickets — fire-and-forget with progress and cancel.

The reference exposes ``wait=False`` on its long-running RPCs: ``execute_code``
returns "OK, <fn> dispatched" immediately (controller.py:524-530) and
``download`` returns a random-hex *ticket* id whose per-node/per-file progress
slots are polled and cancelled through Redis (controller.py:556-597,
worker.py:544-594).  The Spark-first re-expression keeps the contract —
submit now, poll progress, fetch or cancel later — but maps each piece onto
engine primitives instead of a Redis sidecar:

- ticket id        -> a dedicated Spark *job group* (uuid hex, like the
                      reference's ``binascii.hexlify(os.urandom(8))``)
- progress slots   -> the status tracker's per-stage task counts for that
                      job group (completed/total tasks replaces the
                      ``timestamp_filesize`` slot protocol)
- cancel           -> ``SparkContext.cancelJobGroup`` (interrupt-on-cancel),
                      replacing ticket deletion + worker-side abandon checks
- result fetch     -> ``Ticket.result()``, replacing the gather-on-ticket
                      dance in controller.py:460-471

Tickets run on :class:`pyspark.InheritableThread` so the job group and other
thread-local properties propagate correctly under Py4J pinned-thread mode.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from concurrent.futures import CancelledError
from typing import Any

from pyspark import InheritableThread
from pyspark.sql import SparkSession

_STATES = ("running", "done", "failed", "cancelled")


class Ticket:
    """Handle to one asynchronously submitted action.

    State machine: ``running`` -> ``done`` | ``failed`` | ``cancelled``.
    """

    def __init__(self, spark: SparkSession, action: Callable[[], Any], description: str):
        self.spark = spark
        self.ticket_id = uuid.uuid4().hex[:16]
        self.description = description
        self._result: Any = None
        self._error: BaseException | None = None
        self._cancelled = False
        self._finished = threading.Event()

        sc = spark.sparkContext

        def _run() -> None:
            try:
                # interruptOnCancel=True: cancelJobGroup interrupts the task
                # threads, not just deschedules queued tasks
                sc.setJobGroup(self.ticket_id, description, interruptOnCancel=True)
                self._result = action()
            except BaseException as exc:  # noqa: BLE001 - captured for result()
                self._error = exc
            finally:
                self._finished.set()

        self._thread = InheritableThread(target=_run, daemon=True)
        self._thread.start()

    # -- inspection ---------------------------------------------------------

    @property
    def state(self) -> str:
        if not self._finished.is_set():
            return "running"
        if self._error is None:
            # The action produced a result: it is "done" even if a cancel was
            # requested but landed too late to abort anything (the reference's
            # delete_download on an already-finished ticket is likewise a
            # no-op, controller.py:593-597). Cancel only "wins" when it
            # actually interrupted the work.
            return "done"
        return "cancelled" if self._cancelled else "failed"

    def status(self) -> dict:
        """Ticket state plus live task-level progress (the analog of the
        reference's per-file progress slots, controller.py:585-589): completed
        vs total tasks across every stage of this ticket's job group."""
        tracker = self.spark.sparkContext.statusTracker()
        total = completed = active = 0
        for job_id in tracker.getJobIdsForGroup(self.ticket_id):
            job = tracker.getJobInfo(job_id)
            if job is None:
                continue
            for stage_id in job.stageIds:
                stage = tracker.getStageInfo(stage_id)
                if stage is None:  # stage GC'd from the tracker
                    continue
                total += stage.numTasks
                completed += stage.numCompletedTasks
                active += stage.numActiveTasks
        return {
            "ticket": self.ticket_id,
            "description": self.description,
            "state": self.state,
            "total_tasks": total,
            "completed_tasks": completed,
            "active_tasks": active,
            "progress": (completed / total) if total else None,
        }

    # -- lifecycle ----------------------------------------------------------

    def result(self, timeout: float | None = None) -> Any:
        """Block for the action's result (the ``wait=True`` path). Raises
        :class:`TimeoutError` if still running after ``timeout`` seconds,
        :class:`concurrent.futures.CancelledError` if the ticket was
        cancelled, or the action's own exception if it failed."""
        if not self._finished.wait(timeout):
            raise TimeoutError(f"ticket {self.ticket_id} still running")
        if self._error is not None:
            if self._cancelled:
                raise CancelledError(f"ticket {self.ticket_id} was cancelled")
            raise self._error
        return self._result

    def cancel(self) -> None:
        """Cancel every job in this ticket's group. Idempotent; a no-op once
        the ticket already finished."""
        if self._finished.is_set():
            return
        self._cancelled = True
        self.spark.sparkContext.cancelJobGroup(self.ticket_id)

    def wait(self, timeout: float | None = None) -> bool:
        """Wait without raising; True iff the ticket finished."""
        return self._finished.wait(timeout)


def submit(spark: SparkSession, action: Callable[[], Any], description: str = "") -> Ticket:
    """Fire-and-forget an arbitrary driver-side action (typically a closure
    over DataFrame actions: collect/count/write). Returns immediately."""
    return Ticket(spark, action, description or "parqueryd_spark async action")
