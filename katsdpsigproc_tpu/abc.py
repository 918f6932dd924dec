"""Typed protocols for the framework's conventions.

The reference anchors its backend portability in a module of typed ABCs
(reference: src/katsdpsigproc/abc.py:43-465 — devices, contexts, queues,
events, programs, kernels).  Under JAX the runtime owns those objects, so
the protocols that remain meaningful are the *framework* conventions: what
a template, an operation, and a host-oracle flagger stage look like.  They
are `typing.Protocol`s (structural), so user code satisfies them without
inheriting — matching how the reference's template convention is duck-typed
(doc/user/operations.rst:19-80).
"""

from typing import Any, Mapping, Protocol, runtime_checkable


@runtime_checkable
class AbstractTemplate(Protocol):
    """A compile-time-configured operation factory.

    Built once per configuration (compiling/tuning happens here), then
    ``instantiate``\\ d per shape (reference: doc/user/operations.rst:19-47).
    """

    def instantiate(self, command_queue, *args, **kwargs): ...  # pragma: nocover


@runtime_checkable
class AbstractOperation(Protocol):
    """A shape-specialized operation (reference accel.py:1611-1756 surface)."""

    slots: Mapping[str, Any]

    def __call__(self, **inputs): ...  # pragma: nocover

    def parameters(self) -> Mapping[str, Any]: ...  # pragma: nocover

    def required_bytes(self) -> int: ...  # pragma: nocover


@runtime_checkable
class AbstractEventLike(Protocol):
    """Anything the resource layer can wait on (reference abc.py:71-95).

    JAX arrays satisfy the waitable contract through
    :func:`katsdpsigproc_tpu.utils.resource.wait_for_events`; custom events
    implement ``wait``.
    """

    def wait(self) -> None: ...  # pragma: nocover


__all__ = ["AbstractTemplate", "AbstractOperation", "AbstractEventLike"]
