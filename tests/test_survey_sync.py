"""SURVEY §2C ↔ registry drift gate (r10 VERDICT #7).

The §2C count line is generated (tools/gen_survey_2c.py owns the block
between the registry-count markers) and the bullet inventory is
hand-annotated; this test asserts both stay exactly in sync with the live
registry, so a new @query registration without a §2C entry — or a §2C
count edited by hand — fails CI instead of drifting for a round.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

from kinesis_test_spark import registry

_spec = importlib.util.spec_from_file_location(
    "gen_survey_2c", Path(__file__).resolve().parent.parent / "tools" / "gen_survey_2c.py"
)
gen = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("gen_survey_2c", gen)
_spec.loader.exec_module(gen)


def test_survey_2c_matches_registry():
    registry.load_all()
    text = Path(gen.SURVEY).read_text()
    problems = gen.drift(text)
    assert not problems, "; ".join(problems) + (
        " — run `python tools/gen_survey_2c.py` for the count line and add "
        "new keys to the §2C bullet list by hand"
    )


def test_env_conditional_keys_are_actually_unregistered():
    # If an env blocker lifts (e.g. a spark-avro jar appears), the key
    # starts registering and must graduate out of ENV_CONDITIONAL.
    registry.load_all()
    ghosts = gen.ENV_CONDITIONAL & set(registry.QUERIES)
    assert not ghosts, (
        f"{sorted(ghosts)} now register — remove from ENV_CONDITIONAL and "
        "mark ✔ in SURVEY §2C"
    )
