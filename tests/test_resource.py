"""Async resource-ordering tests (reference: test/test_resource.py patterns)."""

import asyncio

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.utils import resource


class DummyEvent:
    """Fake device event (reference test/test_resource.py DummyEvent)."""

    def __init__(self):
        self.waited = 0

    def wait(self):
        self.waited += 1


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


class TestWaitForEvents:
    def test_custom_events(self):
        events = [DummyEvent(), DummyEvent()]
        resource.wait_for_events(events)
        assert all(e.waited == 1 for e in events)

    def test_jax_arrays(self):
        x = jnp.ones(8) * 2
        resource.wait_for_events([x])  # must not raise

    def test_async(self):
        async def main():
            events = [DummyEvent(), jnp.ones(4)]
            await resource.async_wait_for_events(events)
            return events

        events = run(main())
        # async variant clears its internal copy, not the caller's list
        assert len(events) == 2


class TestResource:
    def test_fifo_ordering(self):
        async def main():
            r = resource.Resource("buffer")
            order = []

            a = r.acquire()
            b = r.acquire()

            async def user(name, alloc, events):
                got = await alloc.wait()
                order.append((name, list(got)))
                alloc.ready(events)

            # Run b's wait first; it must still be served after a releases.
            tb = asyncio.ensure_future(user("b", b, []))
            await asyncio.sleep(0)
            ta = asyncio.ensure_future(user("a", a, ["ev-a"]))
            await asyncio.gather(ta, tb)
            return order

        order = run(main())
        assert order == [("a", []), ("b", ["ev-a"])]

    def test_context_manager_value(self):
        async def main():
            r = resource.Resource(42)
            acq = r.acquire()
            with acq as value:
                assert value == 42
                acq.ready()

        run(main())

    def test_context_manager_exception_propagates(self):
        async def main():
            r = resource.Resource(1)
            acq = r.acquire()
            nxt = r.acquire()
            with pytest.raises(RuntimeError):
                with acq:
                    raise RuntimeError("boom")
            with pytest.raises(RuntimeError):
                await nxt.wait()

        run(main())


class TestJobQueue:
    def test_clean_and_finish(self):
        async def main():
            q = resource.JobQueue()

            async def job(result):
                return result

            q.add(job(1))
            q.add(job(2))
            assert len(q) == 2
            assert bool(q)
            await q.finish()
            assert len(q) == 0

        run(main())

    def test_clean_rethrows(self):
        async def main():
            q = resource.JobQueue()

            async def bad():
                raise ValueError("broken job")

            q.add(bad())
            await asyncio.sleep(0)
            await asyncio.sleep(0)
            with pytest.raises(ValueError):
                q.clean()

        run(main())

    def test_finish_max_remaining(self):
        async def main():
            q = resource.JobQueue()
            ev = asyncio.Event()

            async def job():
                await ev.wait()

            q.add(job())
            q.add(job())
            q.add(job())
            ev.set()
            await q.finish(max_remaining=1)
            assert len(q) <= 1

        run(main())


class TestWaitUntil:
    def test_completes(self):
        async def main():
            loop = asyncio.get_event_loop()

            async def quick():
                return 7

            return await resource.wait_until(quick(), loop.time() + 5)

        assert run(main()) == 7

    def test_times_out(self):
        async def main():
            loop = asyncio.get_event_loop()
            never = loop.create_future()
            with pytest.raises(asyncio.TimeoutError):
                await resource.wait_until(never, loop.time() + 0.05)

        run(main())
