"""Docs-runner (VERDICT r1 item 1 done-criterion): every ```python block in
every docs/src page executes, with iteration counts downscaled so the whole
docs suite stays fast.  Pages can't rot against the API.

Conventions for doc authors:
  * ```python blocks run (shared namespace per page, in file order)
  * any other fence language (```text, ```julia, ```bash) is prose
  * a block whose first line is `# docs-runner: skip` is skipped
  * end pages with print()ed error metrics, not asserts — the runner
    downscales maxiters/draw_samples so asserted tolerances would not hold
"""

import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs", "src")

_FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)

# caps applied to keyword arguments in docs code (keep pages fast in CI)
_CAPS = {
    "maxiters": 120,
    "draw_samples": 40,
    "numensemble": 10,
    "nchains": 2,
    "adam_iters": 60,
    "lbfgs_iters": 60,
}


def _downscale(code: str) -> str:
    def cap(m):
        kw, val = m.group(1), int(m.group(2))
        return f"{kw}={min(val, _CAPS[kw])}"

    pat = re.compile(r"\b(" + "|".join(_CAPS) + r")\s*=\s*(\d+)")
    return pat.sub(cap, code)


def _pages():
    out = []
    for root, _, files in os.walk(DOCS):
        for f in sorted(files):
            if f.endswith(".md"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _page_id(path):
    return os.path.relpath(path, DOCS)


@pytest.mark.parametrize("page", _pages(), ids=_page_id)
def test_docs_page_runs(page):
    text = open(page).read()
    blocks = _FENCE.findall(text)
    if not blocks:
        pytest.skip("no python blocks")
    ns = {"__name__": f"docs_{os.path.basename(page)}"}
    for i, block in enumerate(blocks):
        if block.lstrip().startswith("# docs-runner: skip"):
            continue
        code = _downscale(block)
        try:
            exec(compile(code, f"{page}#block{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure formatting
            pytest.fail(f"{_page_id(page)} block {i} failed: "
                        f"{type(e).__name__}: {e}\n--- code ---\n{code}")


def test_docs_pages_have_substance():
    """Every page carries real content (the round-1 review flagged 5-line
    stubs; done-criterion: no page under ~60 substantive lines)."""
    thin = []
    for page in _pages():
        text = open(page).read()
        n_lines = len(text.splitlines())
        if n_lines < 60:
            thin.append((_page_id(page), n_lines))
    assert not thin, f"stub pages remain: {thin}"
