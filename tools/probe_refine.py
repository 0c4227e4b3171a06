"""Per-round timing split of the refine bisection loop on the real TPU.

Wraps the whisper glue's batch_inference_func launch/collect with wall
timers and replays bench.py's refine workload, printing per-round
(launch_ms, collect_ms, host_gap_ms, rows, spans) — the evidence for
whether refine is bound by encoder FLOPs or by serial host<->device
round-trips (the tunnel's warm RTT is ~25-40 ms and every bisection
round is a dependent dispatch+download).
"""
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault('BENCH_MODEL', 'large-v3')
    import bench
    model = bench.build_model()
    minutes = float(os.environ.get('BENCH_MINUTES', '3'))
    audio = bench.synth_speech_like(minutes * 60.0)
    tokenizer = model.get_tokenizer(language='en', task='transcribe')
    from stable_ts_tpu.result import WhisperResult
    seconds = minutes * 60.0
    words, t, i = [], 0.4, 0
    while t < seconds - 1.0:
        w = f' w{i % 97:02d}'
        words.append(dict(word=w, start=round(t, 2), end=round(t + 0.3, 2),
                          probability=0.8, tokens=tokenizer.encode(w)))
        t += 0.45
        i += 1
    segments = [dict(start=chunk[0]['start'], end=chunk[-1]['end'],
                     text=''.join(w['word'] for w in chunk), words=chunk)
                for chunk in (words[j:j + 12]
                              for j in range(0, len(words), 12))]
    base = WhisperResult(dict(
        text=''.join(w['word'] for w in words), segments=segments,
        language='en'))

    from stable_ts_tpu import alignment as al
    orig_make = al._whisper_refinement_batch_func

    events = []

    def make(model_, tokenizer_):
        fn = orig_make(model_, tokenizer_)
        launch0, collect0 = fn.launch, fn.collect
        last_done = [None]

        def launch(requests, key=0):
            t0 = time.perf_counter()
            gap = 0.0 if last_done[0] is None else t0 - last_done[0]
            h = launch0(requests, key=key)
            t1 = time.perf_counter()
            rows = sum(2 for _ in requests)
            events.append(['launch', key, t1 - t0, gap, len(requests), rows])
            return h

        def collect(handle):
            t0 = time.perf_counter()
            out = collect0(handle)
            t1 = time.perf_counter()
            last_done[0] = t1
            events.append(['collect', None, t1 - t0, 0.0, len(out), None])
            return out

        fn.launch, fn.collect = launch, collect
        return fn

    al._whisper_refinement_batch_func = make

    # warm (compile)
    t0 = time.perf_counter()
    model.refine(audio, copy.deepcopy(base), verbose=None)
    print(f'warm pass {time.perf_counter() - t0:.2f}s '
          f'({len(events)} events)', flush=True)
    events.clear()

    t0 = time.perf_counter()
    model.refine(audio, copy.deepcopy(base), verbose=None)
    wall = time.perf_counter() - t0
    n_l = sum(1 for e in events if e[0] == 'launch')
    n_c = sum(1 for e in events if e[0] == 'collect')
    t_l = sum(e[2] for e in events if e[0] == 'launch')
    t_c = sum(e[2] for e in events if e[0] == 'collect')
    t_gap = sum(e[3] for e in events if e[0] == 'launch')
    print(f'wall {wall:.3f}s  launches {n_l} ({t_l:.3f}s)  '
          f'collects {n_c} ({t_c:.3f}s)  host-gaps {t_gap:.3f}s  '
          f'unaccounted {wall - t_l - t_c - t_gap:.3f}s')
    for e in events:
        kind, key, dur, gap, n, rows = e
        if kind == 'launch':
            print(f'  launch key={key} {dur*1e3:7.1f}ms gap={gap*1e3:6.1f}ms '
                  f'spans={n}')
        else:
            print(f'  collect          {dur*1e3:7.1f}ms n={n}')


if __name__ == '__main__':
    main()
