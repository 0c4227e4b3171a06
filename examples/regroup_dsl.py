"""The regroup DSL: programmable segment post-processing.

Same language as the reference (result.py:2980-3024): methods chained with
'_', args with '=', multiple values with '/'. The default chain is
    isp_cm_sp=.* /。/?/？_sg=.5_sp=,* /，++++50_sl=70_cm

Run:  python examples/regroup_dsl.py
"""
import stable_ts_tpu as st


def make_result():
    words = [
        (' Hello', 0.0, 0.4), (' world.', 0.5, 0.9),
        (' This', 2.0, 2.2), (' is', 2.25, 2.4), (' a', 2.45, 2.5),
        (' very', 2.55, 2.8), (' long', 2.85, 3.1), (' sentence,', 3.15, 3.5),
        (' split', 4.6, 4.9), (' me.', 4.95, 5.2),
    ]
    return st.WhisperResult(dict(language='en', segments=[dict(words=[
        dict(word=w, start=s, end=e, probability=0.9) for w, s, e in words])]))


def show(title, result):
    print(f'--- {title}')
    for seg in result.segments:
        print(f'  [{seg.start:5.2f} -> {seg.end:5.2f}] {seg.text}')


def main():
    result = make_result()
    show('raw', result)

    # split on gaps >= 0.5s, then on end-of-sentence punctuation
    result.regroup('sg=.5_sp=.* /。/?/？')
    show("sg=.5_sp='.* /。/?/？'", result)

    # everything is replayable: reset and apply a different chain
    result.reset()
    result.regroup('sl=20')  # split by max segment length
    show('sl=20', result)

    # the applied history travels with the result (and into saved JSON)
    print('history:', result.regroup_history)

    # custom_operation: the mini rule engine
    result.reset()
    result.custom_operation('start', '>=', 4.0, 'remove', word_level=True)
    show('remove words with start >= 4.0', result)


if __name__ == '__main__':
    main()
