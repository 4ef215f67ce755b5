"""A/B instrumentation for the streaming upfront-throughput scenario.

Times the rtf_buf64 / rtf_buf4096 bench blocks with per-phase
attribution: when each render batch was submitted, when its dispatch
returned, when its fetch completed, and how many bytes it moved.
Run me alone (one TPU process at a time!):

    python tools/stream_ab.py [buf64] [buf4096]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = set(sys.argv[1:]) or {"buf64", "buf4096"}
    rng = np.random.default_rng()

    def g64(name, shape):
        return np.fromfile(f"tests/goldens/{name}.f64").reshape(shape)

    f0g = g64("harvest_f0", (-1,)).astype(np.float32)
    spg = g64("cheaptrick_sp", (len(f0g), -1)).astype(np.float32)
    apg = g64("d4c_ap", (len(f0g), -1)).astype(np.float32)
    fftg = 2 * (spg.shape[1] - 1)
    fs = 22050

    from world_tpu.models import realtime as rt

    events = []

    orig_dispatch = rt._RenderWorker._loop.__globals__  # noqa: F841

    class InstrumentedWorker(rt._RenderWorker):
        def submit(self, keys, pulses):
            events.append((time.perf_counter(), "submit", len(pulses)))
            return super().submit(keys, pulses)

        def _fetch_loop(self):
            # wrap the handle fetch with timing
            while True:
                item = self._fetches.get()
                if item is None:
                    return
                bids, keys, fetch = item
                events.append((time.perf_counter(), "fetch_start",
                               len(keys)))
                try:
                    rows = fetch()
                    nbytes = (sum(w.nbytes for _, w in rows[1])
                              if isinstance(rows, tuple) else rows.nbytes)
                    events.append((time.perf_counter(), "fetch_done",
                                   nbytes))
                except BaseException as e:  # noqa: BLE001
                    rows = e
                self._inflight.release()
                self._results.put((bids, keys, rows))

    rt._RenderWorker = InstrumentedWorker

    for bs in (64, 4096):
        if f"buf{bs}" not in which:
            continue
        for it in range(3):
            events.clear()
            synth = rt.StreamingSynthesizer(
                fs, 5.0, fftg, bs, number_of_pointers=200,
                rng_mode="fast", dtype=np.float32,
                device_params=os.environ.get("WORLD_STREAM_DEV",
                                             "1") != "0")
            scale = np.float32(0.5 + rng.random())
            t_add0 = time.perf_counter()
            ok = synth.add_parameters(f0g, spg * scale, apg)
            assert ok
            t0 = time.perf_counter()
            rendered = 0
            calls = 0
            while synth.synthesis2():
                rendered += bs
                calls += 1
            t1 = time.perf_counter()
            dt = t1 - t0
            rtf = rendered / fs / dt
            ev = [(round(1e3 * (t - t0), 1), k, v) for t, k, v in events]
            print(f"bs={bs} it={it}: rtf={rtf:.2f} dt={1e3*dt:.1f}ms "
                  f"calls={calls} add_ms={1e3*(t0-t_add0):.1f} "
                  f"events={ev}")
            synth.close()


if __name__ == "__main__":
    main()
