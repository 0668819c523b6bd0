"""Gradio UI tests against a stub `gradio` module.

gradio is not installed in this image, so the UI's Blocks graph and tab
callbacks had never executed in CI. A minimal fake of the gradio surface
ui.py uses (Blocks/Tab/Markdown/TextArea/Audio/Dropdown/File/Button) lets
the graph build and the four tab callbacks run against a random-weights
bundle — catching signature drift against api.* (the reference UI is its
most user-visible surface, launch-ui.py:511-622).
"""

import os
import sys
import types

import numpy as np
import pytest

from vallex_tpu import api
from vallex_tpu.config import SAMPLE_RATE, EngineConfig, ModelConfig

TINY = ModelConfig(d_model=64, num_heads=4, num_layers=2, ffn_dim=256)
ECFG = EngineConfig(
    text_buckets=(64, 128), audio_buckets=(128, 256, 512),
    compute_dtype="float32",
)


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs

    def click(self, fn, inputs, outputs):
        _REGISTRY["clicks"].append(
            {"fn": fn, "inputs": inputs, "outputs": outputs,
             "tab": _REGISTRY["current_tab"]}
        )


class _Ctx(_Component):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.launched = None

    def __enter__(self):
        if self.args and isinstance(self.args[0], str):  # Tab
            _REGISTRY["current_tab"] = self.args[0]
            _REGISTRY["tabs"].append(self.args[0])
        return self

    def __exit__(self, *exc):
        _REGISTRY["current_tab"] = None
        return False

    def launch(self, **kwargs):
        self.launched = kwargs
        _REGISTRY["launch_kwargs"] = kwargs


_REGISTRY = {}


def _install_fake_gradio():
    _REGISTRY.clear()
    _REGISTRY.update(
        {"clicks": [], "tabs": [], "current_tab": None, "launch_kwargs": None}
    )
    gr = types.ModuleType("gradio")
    gr.Blocks = _Ctx
    gr.Tab = _Ctx
    for name in ("Markdown", "TextArea", "Audio", "Dropdown", "File",
                 "Button"):
        setattr(gr, name, _Component)
    sys.modules["gradio"] = gr
    return gr


@pytest.fixture()
def fake_gradio():
    had = sys.modules.get("gradio")
    _install_fake_gradio()
    yield _REGISTRY
    if had is None:
        sys.modules.pop("gradio", None)
    else:
        sys.modules["gradio"] = had


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("empty_ckpts")
    return api.preload_models(
        str(ckpt), random_weights=True, cfg=TINY, ecfg=ECFG
    )


def test_ui_blocks_graph_and_wiring(fake_gradio, bundle):
    """The Blocks graph builds: 4 tabs (matching the reference UI's),
    one Generate/Make binding per tab, callback arity == inputs arity."""
    import inspect

    from vallex_tpu.ui import launch_ui

    launch_ui(port=7861)

    assert fake_gradio["tabs"] == [
        "Infer from audio", "Make prompt", "Infer from prompt", "Long text",
    ]
    assert len(fake_gradio["clicks"]) == 4
    for c in fake_gradio["clicks"]:
        n_params = len(inspect.signature(c["fn"]).parameters)
        assert n_params == len(c["inputs"]), c["tab"]
        assert len(c["outputs"]) == 1
    assert fake_gradio["launch_kwargs"] == {"server_port": 7861}
    # preset dropdowns see the shipped voices
    prompt_cb = [c for c in fake_gradio["clicks"]
                 if c["tab"] == "Infer from prompt"][0]
    # reconstruct preset list the same way ui.py does
    presets = []
    for d in api.PROMPT_SEARCH_DIRS:
        if os.path.isdir(d):
            presets += [f[:-4] for f in os.listdir(d) if f.endswith(".npz")]
    assert "paimon" in presets


def test_ui_raises_actionable_error_without_gradio():
    from vallex_tpu.ui import launch_ui

    had = sys.modules.pop("gradio", None)
    sys.modules["gradio"] = None  # force ImportError on import
    try:
        with pytest.raises((RuntimeError, ImportError), match="gradio|None"):
            launch_ui()
    finally:
        if had is None:
            sys.modules.pop("gradio", None)
        else:
            sys.modules["gradio"] = had


@pytest.mark.slow
def test_ui_tab_callbacks_execute(fake_gradio, bundle, tmp_path):
    """Drive all four tab callbacks end-to-end (best_of=5 like the
    reference UI) against the random-weights bundle."""
    from vallex_tpu.ui import launch_ui
    from vallex_tpu.utils.audio import save_wav

    launch_ui(port=7861)
    by_tab = {c["tab"]: c["fn"] for c in fake_gradio["clicks"]}

    # Infer from prompt
    sr, wave = by_tab["Infer from prompt"](
        "Hi.", "paimon", "auto-detect", "no-accent"
    )
    assert sr == SAMPLE_RATE and wave.ndim == 1 and len(wave) > 0

    # Make prompt (transcript given: no ASR needed)
    clip = str(tmp_path / "clip.wav")
    t = np.linspace(0, 2.0, 2 * SAMPLE_RATE, endpoint=False)
    save_wav(clip, (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))
    os.chdir(tmp_path)  # make_npz writes to ./customs
    npz = by_tab["Make prompt"]("uivoice", clip, "a test tone")
    assert os.path.exists(npz)

    # Infer from audio (temp prompt + GC path)
    sr, wave = by_tab["Infer from audio"](
        "Hello.", clip, "a test tone", "en", "no-accent"
    )
    assert sr == SAMPLE_RATE and len(wave) > 0

    # Long text (two sentences, fixed-prompt mode)
    sr, wave = by_tab["Long text"](
        "One sentence here. Another one there.", "paimon", "fixed-prompt"
    )
    assert sr == SAMPLE_RATE and len(wave) > 0
