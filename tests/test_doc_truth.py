"""Doc-truth guard: docs may not cite measurements that don't exist.

Rounds 3 and 4 both shipped STATUS.md/CONFIG.md bullets claiming numbers
were "measured ... see PERF.md <section>" before any such PERF.md content
existed (VERDICT r4 weak #2). This pins the contract mechanically:

1. every ``model.remat`` mode documented in CONFIG.md must be mentioned
   in PERF.md (a mode whose cost was never recorded may not ship with a
   "measured" row);
2. every PERF.md section referenced by name from STATUS.md / CONFIG.md
   (the ``PERF.md "Section title"`` form) must actually exist as PERF.md
   text.
"""

import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(_REPO, name)) as fh:
        return fh.read()


def test_every_config_remat_mode_has_perf_coverage():
    config_md = _read("CONFIG.md")
    perf_md = _read("PERF.md").lower()
    remat_row = next(
        (
            line
            for line in config_md.splitlines()
            if line.startswith("| `remat`")
        ),
        None,
    )
    assert remat_row is not None, "CONFIG.md lost its model.remat row"
    modes = set(re.findall(r"`([a-z_]+)`", remat_row)) - {"remat", "none"}
    assert modes >= {"full", "conv", "offload"}, modes
    for mode in sorted(modes):
        assert re.search(rf"\b{mode}\b", perf_md), (
            f"CONFIG.md documents model.remat: {mode} but PERF.md never "
            f"mentions it — record the measurement (or drop the mode) "
            f"before shipping the doc row"
        )


def test_1024_stretch_config_matches_recorded_recipe():
    """PERF.md "The single-chip 1024px recipe" is the one source of truth
    for the stretch point; the shipped YAML must encode it knob for knob
    (VERDICT r4 item 8)."""
    import yaml

    with open(os.path.join(_REPO, "configs/experiment_1024_stretch.yaml")) as fh:
        cfg = yaml.safe_load(fh)
    perf_md = _read("PERF.md")
    assert "The single-chip 1024px recipe" in perf_md
    assert cfg["model"]["remat"] == "full"
    assert cfg["model"]["attention_impl"] == "auto"
    assert cfg["data"]["batch_size"] == 1
    assert cfg["data"]["resolution"] == 1024
    assert cfg["training"]["mixed_precision"] == "bf16"
    assert cfg["tracking"]["enabled"] is True  # tracking costs noise


def test_perf_sections_cited_from_docs_exist():
    # markdown wraps citations across lines, so compare with collapsed
    # whitespace on both sides
    perf_md = re.sub(r"\s+", " ", _read("PERF.md"))
    for doc in ("STATUS.md", "CONFIG.md"):
        text = _read(doc)
        for section in re.findall(r'PERF\.md[^"\n]*"([^"]+)"', text):
            needle = re.sub(r"\s+", " ", section)
            assert needle in perf_md, (
                f'{doc} cites PERF.md section "{needle}" which does not '
                f"exist in PERF.md"
            )
