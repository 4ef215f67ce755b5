"""Paced-streaming latency budget: replicate bench.py's real-time paced
frame feed and attribute each buffer's lag to named terms:

  stage->submit  hold/batching wait before the pulse's render dispatched
  submit->land   device round trip (dispatch + compute + fetch + queue)
  land->avail    detection by the pump loop after the batch landed

Run alone (one TPU process at a time):  python tools/stream_paced_debug.py
[hold_force_ms dispatch_min]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    hold_force = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    dmin = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.default_rng()

    def g64(name, shape):
        return np.fromfile(f"tests/goldens/{name}.f64").reshape(shape)

    f0g = g64("harvest_f0", (-1,)).astype(np.float32)
    spg = g64("cheaptrick_sp", (len(f0g), -1)).astype(np.float32)
    apg = g64("d4c_ap", (len(f0g), -1)).astype(np.float32)
    fftg = 2 * (spg.shape[1] - 1)
    fs = 22050
    frame_s = 0.005
    bs = 64

    from world_tpu.models import realtime as rt

    stage_t = {}    # key -> first staged time
    submit_t = {}   # key -> submit time
    land_t = {}     # key -> landed time
    batch_sizes = []

    orig_submit = rt.StreamingSynthesizer._submit

    def submit(self, keys, params):
        now = time.perf_counter()
        for k in keys:
            submit_t[k] = now
        batch_sizes.append(len(keys))
        return orig_submit(self, keys, params)

    rt.StreamingSynthesizer._submit = submit

    orig_stage = rt.StreamingSynthesizer._collect_lookahead

    def collect(self, base=0):
        params, keys = orig_stage(self, base)
        now = time.perf_counter()
        for k in keys:
            stage_t.setdefault(k, now)
        return params, keys

    rt.StreamingSynthesizer._collect_lookahead = collect

    orig_absorb = rt._RenderWorker._absorb

    def absorb(self, item, into):
        now = time.perf_counter()
        for k in item[0] and item[1]:
            land_t.setdefault(k, now)
        return orig_absorb(self, item, into)

    rt._RenderWorker._absorb = absorb

    y_total = int((len(f0g) - 1) * frame_s * fs) + 1

    def run(paced):
        stage_t.clear()
        submit_t.clear()
        land_t.clear()
        batch_sizes.clear()
        synth = rt.StreamingSynthesizer(
            fs, 5.0, fftg, bs, number_of_pointers=250, rng_mode="fast",
            dtype=np.float32, hold_on_miss=True, dispatch_min_pulses=dmin,
            hold_force_ms=hold_force).warmup()
        scale = np.float32(0.5 + rng.random())
        spl = spg * scale
        avail = []
        feed_t = []
        t0 = time.perf_counter()

        def pump():
            ok = synth.synthesis2()
            if ok:
                avail.append(time.perf_counter() - t0)
            return ok

        for i in range(len(f0g)):
            if paced:
                while time.perf_counter() - t0 < i * frame_s:
                    if not pump():
                        time.sleep(2e-4)
            while not synth.add_parameters(f0g[i: i + 1], spl[i: i + 1],
                                           apg[i: i + 1]):
                pump()
            feed_t.append(time.perf_counter() - t0)
            while pump():
                pass
        deadline = time.perf_counter() + 20.0
        while len(avail) * bs < y_total - bs \
                and time.perf_counter() < deadline:
            if not pump():
                if synth.synthesized_sample + bs >= synth.last_location:
                    break
                time.sleep(2e-4)
        synth.close()
        return avail, feed_t, t0

    run(paced=False)  # warmup/compile
    for it in range(2):
        avail, feed_t, t0 = run(paced=True)
        nb = len(avail)
        need = np.minimum((np.ceil((np.arange(1, nb + 1) * bs)
                                   / (frame_s * fs)) + 1).astype(int),
                          len(feed_t) - 1)
        lag_ms = 1e3 * (np.asarray(avail) - np.asarray(feed_t)[need])
        # batch-level terms
        ks = [k for k in submit_t if k in land_t and k in stage_t]
        hold = np.asarray([1e3 * (submit_t[k] - stage_t[k]) for k in ks])
        trip = np.asarray([1e3 * (land_t[k] - submit_t[k]) for k in ks])

        def pct(a):
            return {p: round(float(np.percentile(a, p)), 1)
                    for p in (50, 90, 99)}

        print(f"it={it}: buffers={nb} lag_ms={pct(lag_ms[16:])} "
              f"max={lag_ms[16:].max():.1f}")
        print(f"   stage->submit {pct(hold)}  submit->land {pct(trip)} "
              f"batches={len(batch_sizes)} "
              f"sizes p50/p90/max={int(np.percentile(batch_sizes,50))}/"
              f"{int(np.percentile(batch_sizes,90))}/{max(batch_sizes)}")


if __name__ == "__main__":
    main()
