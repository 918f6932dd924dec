"""Utilities for scheduling device operations with asyncio.

Re-design of the reference's resource-ordering layer (reference:
src/katsdpsigproc/resource.py) for JAX's asynchronous-dispatch model.  The
reference's pattern — "acquire early, wait late", FIFO futures carrying
device events so that pipeline stages order themselves without host stalls
(doc/user/resource.rst:40-65) — survives unchanged at the host ingest
boundary (streaming dumps in and flags out while the device computes).

What changes is the event type: instead of CUDA/OpenCL events, an "event"
here is anything :func:`jax.block_until_ready` accepts — typically a JAX
array (or pytree) whose computation was asynchronously dispatched.  Waiting
for the event means the producing computation has completed on-device.
"""

import asyncio
import collections
import logging
from types import TracebackType
from typing import Awaitable, Deque, Generic, Iterable, List, Optional, Type, TypeVar

import jax

_T = TypeVar("_T")
_logger = logging.getLogger(__name__)


def wait_for_events(events: List) -> None:
    """Block the calling thread until all events' computations are done.

    An event is a JAX array/pytree (``block_until_ready``) or any object
    with a ``wait()`` method (for interoperability with custom events).
    """
    for event in events:
        if hasattr(event, "wait"):
            event.wait()
        else:
            jax.block_until_ready(event)


async def wait_until(future: Awaitable[_T], when: float,
                     loop: Optional[asyncio.AbstractEventLoop] = None) -> _T:
    """Like :func:`asyncio.wait_for`, but with an absolute deadline.

    ``when`` is a time on the event loop's clock (``loop.time()``); the
    same contract as the reference (resource.py:31-56).  Implemented on
    :func:`asyncio.wait` rather than :func:`asyncio.wait_for`: ``wait_for``
    *awaits* the future after cancelling it, which never returns when the
    work cannot actually be cancelled — e.g. a run_in_executor thread
    blocked in a device wait on a hung remote chip, exactly the situation
    a deadline exists for.  Here the deadline fires unconditionally:
    cancellation is requested best-effort and the TimeoutError is raised
    immediately, leaving an uncancellable worker to finish in the
    background.
    """
    if loop is None:
        loop = asyncio.get_event_loop()
    pending = asyncio.ensure_future(future, loop=loop)
    done, _ = await asyncio.wait((pending,), timeout=max(0.0, when - loop.time()))
    if not done:
        pending.cancel()
        raise asyncio.TimeoutError()
    return pending.result()


async def async_wait_for_events(events: Iterable,
                                loop: Optional[asyncio.AbstractEventLoop] = None) -> None:
    """Coroutine that waits for a list of device events.

    Runs the blocking waits in an executor thread so the event loop stays
    live (reference resource.py:59-80).  References to the events are
    dropped inside the worker before the future resolves, avoiding the
    event-destruction race the reference documents (resource.py:68-74).
    """

    def wait_all(events: List) -> None:
        wait_for_events(events)
        events.clear()

    if loop is None:
        loop = asyncio.get_event_loop()
    events = list(events)
    if events:
        await loop.run_in_executor(None, wait_all, events)


class ResourceAllocation(Generic[_T]):
    """A handle representing a future acquisition of a resource.

    Semantics are identical to the reference (resource.py:83-163): call
    :meth:`wait` (or :meth:`wait_events`) to receive the previous holder's
    completion events, and :meth:`ready` with your own events when done.
    Context-manager use releases with a warning (or propagates the
    exception) if :meth:`ready` was never called.
    """

    def __init__(self, start: "asyncio.Future[List]", end: "asyncio.Future[List]",
                 value: _T, loop: asyncio.AbstractEventLoop) -> None:
        self._start = start
        self._end = end
        self._loop = loop
        self.value = value

    def wait(self) -> "asyncio.Future[List]":
        """Future resolving to the device events to wait for before use."""
        return self._start

    async def wait_events(self) -> None:
        """Wait on the host for previous use of the resource to complete."""
        events = await self._start
        await async_wait_for_events(events, loop=self._loop)

    def ready(self, events: Optional[List] = None) -> None:
        """Release to the next acquirer, handing over completion `events`."""
        if events is None:
            events = []
        self._end.set_result(events)

    def __enter__(self) -> _T:
        return self.value

    def __exit__(self, exc_type: Optional[Type[BaseException]],
                 exc_value: Optional[BaseException],
                 exc_tb: Optional[TracebackType]) -> None:
        if not self._end.done():
            if exc_value is not None:
                self._end.set_exception(exc_value)
                self._end.exception()  # mark retrieved; it also propagates
            else:
                _logger.warning("Resource allocation was not explicitly made ready")
                self.ready()


class Resource(Generic[_T]):
    """Abstraction of a contended resource (reference resource.py:166-208).

    Acquisition is non-blocking and strictly FIFO: each
    :meth:`acquire` returns a handle whose start-future is the previous
    acquirer's end-future.
    """

    def __init__(self, value: _T, loop: Optional[asyncio.AbstractEventLoop] = None) -> None:
        if loop is None:
            loop = asyncio.get_event_loop()
        self._loop = loop
        self._future: "asyncio.Future[List]" = asyncio.Future(loop=loop)
        self._future.set_result([])
        self.value = value

    def acquire(self) -> ResourceAllocation[_T]:
        old = self._future
        self._future = asyncio.Future(loop=self._loop)
        return ResourceAllocation(old, self._future, self.value, loop=self._loop)


class JobQueue:
    """Maintain a bounded list of in-flight asynchronous jobs
    (reference resource.py:211-245)."""

    def __init__(self) -> None:
        self._jobs: Deque[asyncio.Future] = collections.deque()

    def add(self, job: Awaitable) -> None:
        """Append a job (coroutines are wrapped in tasks automatically)."""
        self._jobs.append(asyncio.ensure_future(job))

    def clean(self) -> None:
        """Remove completed jobs from the front, re-raising their exceptions."""
        while self._jobs:
            head = self._jobs[0]
            if not head.done():
                break
            self._jobs.popleft()
            head.result()  # propagates a failed job's exception

    async def finish(self, max_remaining: int = 0) -> None:
        """Wait until at most `max_remaining` jobs are outstanding.

        The queue length is re-checked after every await, so jobs added
        concurrently (while this coroutine is suspended) are also drained.
        """
        while True:
            if len(self._jobs) <= max_remaining:
                return
            head = self._jobs.popleft()
            await head

    def __len__(self) -> int:
        return len(self._jobs)

    def __bool__(self) -> bool:
        return len(self._jobs) > 0

    def __contains__(self, item: asyncio.Future) -> bool:
        return any(job is item for job in self._jobs)


__all__ = [
    "wait_for_events",
    "wait_until",
    "async_wait_for_events",
    "Resource",
    "ResourceAllocation",
    "JobQueue",
]
