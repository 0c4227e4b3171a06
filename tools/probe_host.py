"""Host-pipeline phase probe: where does `other(host)` actually go?

Builds the host workload of a 30-min transcription (~400 segments /
~4000 words, the bench's synthetic density) and times each finish-phase
stage in isolation — Segment construction, silence suppression, result
construction, regroup, SRT render — plus a cProfile top list. Pure host
work; runs anywhere (no TPU claim).

Usage: python tools/probe_host.py [--minutes 30] [--profile]
"""
import argparse
import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def synth_segments(minutes: float):
    """Segment dicts shaped like finish_group's input (words included)."""
    rng = np.random.default_rng(0)
    seconds = minutes * 60.0
    segs, t, wid = [], 0.3, 0
    while t < seconds - 2.0:
        seg_dur = float(rng.uniform(2.0, 6.0))
        seg_end = min(t + seg_dur, seconds)
        words = []
        wt = t
        while wt < seg_end - 0.1:
            dur = float(rng.uniform(0.12, 0.42))
            w = f' w{wid % 97:02d}'
            words.append(dict(word=w, start=round(wt, 3),
                              end=round(min(wt + dur, seg_end), 3),
                              probability=float(rng.uniform(0.5, 1.0)),
                              tokens=[100 + wid % 500, 700 + wid % 300]))
            wt += dur + float(rng.uniform(0.02, 0.2))
            wid += 1
        if not words:
            t = seg_end + 0.4
            continue
        segs.append(dict(
            seek=round(max(0.0, t - 1.0), 3), start=words[0]['start'],
            end=words[-1]['end'], text=''.join(w['word'] for w in words),
            tokens=[tk for w in words for tk in w['tokens']],
            temperature=0.0, avg_logprob=-0.3, compression_ratio=1.2,
            no_speech_prob=0.1, words=words))
        t = seg_end + float(rng.uniform(0.2, 1.2))
    return segs, seconds


def synth_silence(seconds: float):
    """(silent_starts, silent_ends) arrays like the predictor emits."""
    rng = np.random.default_rng(1)
    starts, ends, t = [], [], 0.0
    while t < seconds:
        t += float(rng.uniform(2.0, 8.0))
        d = float(rng.uniform(0.2, 1.2))
        starts.append(t)
        ends.append(min(t + d, seconds))
        t += d
    return np.asarray(starts), np.asarray(ends)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--minutes', type=float, default=30.0)
    ap.add_argument('--profile', action='store_true')
    args = ap.parse_args()

    from stable_ts_tpu.result import Segment, WhisperResult

    segs, seconds = synth_segments(args.minutes)
    n_words = sum(len(s['words']) for s in segs)
    print(f'workload: {len(segs)} segments, {n_words} words '
          f'({args.minutes:.0f} min)')
    sil = synth_silence(seconds)

    phases = {}

    def timeit(name, fn, n=3):
        best = min(_run_once(fn) for _ in range(n))
        phases[name] = best
        print(f'{name:28s} {best * 1e3:8.1f} ms')
        return best

    def _run_once(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # 1. per-segment Segment construction + suppression + to_dict
    #    (finish_group's inner loop, batched.py:656-665)
    def construct_suppress():
        out = []
        for seg in segs:
            seg_obj = Segment(**seg, ignore_unused_args=True)
            seg_obj = seg_obj.suppress_silence(
                *sil, min_word_dur=0.1, word_level=True,
                nonspeech_error=0.1, use_word_position=True)
            out.append(seg_obj.to_dict())
        return out

    timeit('Segment+suppress+to_dict', construct_suppress)
    suppressed = construct_suppress()

    # 2. final WhisperResult construction (batched.py:721)
    def build_result():
        all_segments = [{'id': i, **s} for i, s in enumerate(suppressed)]
        return WhisperResult(dict(
            text=''.join(s['text'] for s in all_segments),
            segments=all_segments, language='en'), force_order=False)

    timeit('WhisperResult ctor', build_result)
    result = build_result()

    # 3. nonspeech sections
    timeit('update_nonspeech_sections',
           lambda: build_result().update_nonspeech_sections(*sil))

    # 4. default regroup chain
    import copy
    timeit('regroup(True)', lambda: copy.deepcopy(result).regroup(True))
    result.regroup(True)

    # 5. renders
    timeit('to_srt_vtt(word_level)', lambda: result.to_srt_vtt(
        word_level=True, verbose_output=False)
        if 'verbose_output' in result.to_srt_vtt.__code__.co_varnames
        else result.to_srt_vtt(word_level=True))

    total = sum(phases.values())
    print(f'{"TOTAL":28s} {total * 1e3:8.1f} ms')

    if args.profile:
        pr = cProfile.Profile()
        pr.enable()
        construct_suppress()
        r = build_result()
        r.regroup(True)
        r.to_srt_vtt(word_level=True)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats('cumulative').print_stats(30)
        print(s.getvalue())


if __name__ == '__main__':
    main()
