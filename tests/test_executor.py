"""Pipelined host executor tests (the nodelet-graph overlap equivalent)."""

import threading
import time

import pytest

from limo_tpu.pipeline.executor import PrefetchExecutor, run_pipelined


class TestPrefetchExecutor:
    def test_order_preserved(self):
        out = list(PrefetchExecutor(lambda i: i * i, range(20), prefetch=4))
        assert out == [i * i for i in range(20)]

    def test_empty_and_short(self):
        assert list(PrefetchExecutor(lambda i: i, [])) == []
        assert list(PrefetchExecutor(lambda i: i, [7], prefetch=5)) == [7]

    def test_bounded_inflight(self):
        """Never more than ``prefetch`` loads ahead of consumption."""
        lock = threading.Lock()
        inflight = [0]
        max_seen = [0]

        def load(i):
            with lock:
                inflight[0] += 1
                max_seen[0] = max(max_seen[0], inflight[0])
            time.sleep(0.005)
            with lock:
                inflight[0] -= 1
            return i

        list(PrefetchExecutor(load, range(30), prefetch=3, workers=3))
        assert max_seen[0] <= 3

    def test_overlaps_io_with_compute(self):
        """Pipelined wall time beats serial when IO and compute both sleep
        (IO sleeps release the GIL like real file reads)."""
        io_s, compute_s, n = 0.01, 0.01, 20

        def load(i):
            time.sleep(io_s)
            return i

        t0 = time.time()
        acc = []
        for x in PrefetchExecutor(load, range(n), prefetch=3, workers=2):
            time.sleep(compute_s)
            acc.append(x)
        pipelined = time.time() - t0
        assert acc == list(range(n))
        serial = n * (io_s + compute_s)
        assert pipelined < serial * 0.85, (pipelined, serial)

    def test_load_exception_propagates(self):
        def load(i):
            if i == 3:
                raise ValueError("boom")
            return i

        with pytest.raises(ValueError, match="boom"):
            list(PrefetchExecutor(load, range(6), prefetch=2))

    def test_invalid_prefetch(self):
        with pytest.raises(ValueError):
            PrefetchExecutor(lambda i: i, [1], prefetch=0)


class TestRunPipelined:
    def test_drives_pipeline_like_object(self):
        class FakePipe:
            def __init__(self):
                self.seen = []

            def process(self, stamp, image, cloud):
                self.seen.append((stamp, image, cloud))
                return stamp

        pipe = FakePipe()
        res = run_pipelined(pipe, range(5),
                            load=lambda i: (float(i), f"img{i}", None))
        assert res == [float(i) for i in range(5)]
        assert [s[0] for s in pipe.seen] == [float(i) for i in range(5)]
