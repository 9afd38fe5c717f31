"""Golden conformance matrix ported from the reference test suite:
STRINGS and PROTOCOLS corpora x 4 preset configs
(/root/reference/test/test_helper.rb:38-192, executed per preset in
/root/reference/test/selma_sanitizer_elements_test.rb:82-168).

The corpus itself lives in selma_ray.engine.conformance (the bench
reports its pass rate); these tests pinpoint individual failing cells.
"""

import pytest

from selma_ray.engine.conformance import (
    PRESETS,
    PROTOCOLS,
    STRINGS,
    build_rewriter,
    run_conformance,
)


@pytest.mark.parametrize("name", list(STRINGS))
@pytest.mark.parametrize("preset", list(PRESETS))
def test_strings_matrix(name, preset):
    data = STRINGS[name]
    assert build_rewriter(preset).rewrite(data["html"]) == data[preset]


@pytest.mark.parametrize("name", list(PROTOCOLS))
@pytest.mark.parametrize("preset", list(PRESETS))
def test_protocols_matrix(name, preset):
    data = PROTOCOLS[name]
    assert build_rewriter(preset).rewrite(data["html"]) == data[preset]


def test_run_conformance_reports_full_pass():
    r = run_conformance()
    assert r["total"] == (len(STRINGS) + len(PROTOCOLS)) * len(PRESETS)
    assert r["pass_rate"] == 1.0 and not r["failures"]
