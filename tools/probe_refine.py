#!/usr/bin/env python
"""Refine phase probe: where does a bisection round's wall time go?

Wraps the whisper refinement batch func's launch/collect pair with timers
and runs the bench-shaped refine workload (BENCH_MODE=refine twin —
~400 words @ prob 0.8 over BENCH_MINUTES of audio), printing per-round
dispatch wall (launch = host prep + interval upload + device dispatch),
collect wall (device wait + download), and the host gaps in between.

Run on the real TPU: python tools/probe_refine.py [model] [minutes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(model_name='large-v3', minutes=3.0):
    import copy

    os.environ['BENCH_MODEL'] = model_name   # before bench reads it
    from bench import build_model, synth_speech_like
    from stable_ts_tpu.result import WhisperResult

    model = build_model()
    tokenizer = model.get_tokenizer(language='en', task='transcribe')
    seconds = float(minutes) * 60.0
    audio = synth_speech_like(seconds)
    words, t, i = [], 0.4, 0
    while t < seconds - 1.0:
        w = f' w{i % 97:02d}'
        words.append(dict(word=w, start=round(t, 2), end=round(t + 0.3, 2),
                          probability=0.8, tokens=tokenizer.encode(w)))
        t += 0.45
        i += 1
    segments = [dict(start=c[0]['start'], end=c[-1]['end'],
                     text=''.join(w['word'] for w in c), words=c)
                for c in (words[j:j + 12] for j in range(0, len(words), 12))]
    base = WhisperResult(dict(text=''.join(w['word'] for w in words),
                              segments=segments, language='en'))

    import stable_ts_tpu.alignment as al
    orig = al._whisper_refinement_batch_func
    ev = []   # (kind, key, n_reqs, t_start, t_end)

    def wrapped(model, tokenizer):
        f = orig(model, tokenizer)
        ol, oc = f.launch, f.collect

        def launch(reqs, key=0):
            t0 = time.perf_counter()
            h = ol(reqs, key=key)
            ev.append(('launch', key, len(reqs), t0, time.perf_counter()))
            return h

        def collect(h):
            t0 = time.perf_counter()
            r = oc(h)
            ev.append(('collect', None, 0, t0, time.perf_counter()))
            return r

        f.launch, f.collect = launch, collect
        return f

    al._whisper_refinement_batch_func = wrapped

    for it in range(3):
        ev.clear()
        t0 = time.perf_counter()
        model.refine(audio, copy.deepcopy(base), verbose=None)
        wall = time.perf_counter() - t0
        launches = [e for e in ev if e[0] == 'launch']
        collects = [e for e in ev if e[0] == 'collect']
        t_launch = sum(e[4] - e[3] for e in launches)
        t_collect = sum(e[4] - e[3] for e in collects)
        covered = sorted((e[3], e[4]) for e in ev)
        span = covered[-1][1] - covered[0][0] if covered else 0.0
        gaps = span - sum(b - a for a, b in covered)
        print(f'iter {it}: wall={wall:.2f}s xRT={seconds / wall:.1f} '
              f'rounds={len(launches)} rows={sum(e[2] for e in launches)} '
              f'launch={t_launch:.2f}s collect(dev wait+dl)={t_collect:.2f}s '
              f'host gaps={gaps:.2f}s outside={wall - span:.2f}s')
        if it == 2:
            per = {}
            for e in collects:
                per.setdefault('collect', []).append(e[4] - e[3])
            cs = sorted(per.get('collect', []))
            if cs:
                import statistics
                print(f'  collect percentiles: min={cs[0]:.3f} '
                      f'med={statistics.median(cs):.3f} max={cs[-1]:.3f}')


if __name__ == '__main__':
    args = sys.argv[1:]
    main(*(args[:1] + [float(a) for a in args[1:2]]))
