"""Visualization + resume/unfinished surfaces (model-free where possible)."""
import os

import numpy as np
import pytest


class TestVisualizeSuppression:
    def test_png_written(self, tmp_path):
        from stable_ts_tpu.stabilization import visualize_suppression
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(16000 * 2) * 0.3).astype(np.float32)
        audio[16000:] *= 0.01  # silent second half
        out = str(tmp_path / 'sup.png')
        visualize_suppression(audio, output=out)
        assert os.path.isfile(out) and os.path.getsize(out) > 100

    def test_max_width_downsamples(self, tmp_path):
        from stable_ts_tpu.stabilization import visualize_suppression
        rng = np.random.default_rng(1)
        audio = (rng.standard_normal(16000 * 4) * 0.2).astype(np.float32)
        out = str(tmp_path / 'sup2.png')
        visualize_suppression(audio, output=out, max_width=600)
        from PIL import Image
        assert Image.open(out).size[0] <= 600


class TestVideoComparisonGating:
    def test_missing_ffmpeg_raises_helpfully(self, tmp_path):
        import shutil
        if shutil.which('ffmpeg'):
            pytest.skip('ffmpeg present; gating untestable')
        from stable_ts_tpu.video_output import encode_video_comparison
        with pytest.raises((FileNotFoundError, RuntimeError, OSError)):
            encode_video_comparison('a.mp4', ['x.srt', 'y.srt'],
                                    output_videopath=str(tmp_path / 'o.mp4'))
