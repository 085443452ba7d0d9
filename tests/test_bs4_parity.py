"""bs4/lxml-gated parity tests (VERDICT round 1, 'what's wrong' #5).

The byte-identical-text contract is engine == htmlx-oracle in this sandbox,
which is self-referential: htmlx REPLICATES bs4.get_text semantics but
nothing here proves it against the real library (bs4/lxml are absent —
verified).  These tests close that gap wherever the libs exist: they are
SKIPPED in this sandbox and activate automatically in any environment with
bs4+lxml installed, comparing htmlx against BeautifulSoup on the full
synthetic corpus plus adversarial fragments.
"""

import importlib.util

import pytest

from frontier_engine import synth
from frontier_engine.htmlx import parse_html

_HAS_BS4 = (
    importlib.util.find_spec("bs4") is not None
    and importlib.util.find_spec("lxml") is not None
)

pytestmark = pytest.mark.skipif(
    not _HAS_BS4,
    reason="bs4/lxml not installed in this sandbox — a CI runner that HAS "
    "them must treat this skip as a FAILURE (README 'Library-gated tests')",
)

ADVERSARIAL = [
    "<p>a<!-- comment -->b</p>",
    "<div><p>unclosed<div>sibling</div>",
    '<meta name="a" name="b" content="x"><p id="1" id="2">dup attrs</p>',
    "<script>var x = '<p>not text</p>';</script><p>real</p>",
    "<td>cell</td>",  # fragment outside a table
    "text &amp; entities &#65; &unknown;",
    "",
    "<br><hr><img src=x>",
]


def _pages():
    return [r["html"].decode("utf-8") for r in synth.gen_pages(200, with_text=False)]


def test_get_text_separator_strip_matches_bs4():
    from bs4 import BeautifulSoup

    for html in _pages() + ADVERSARIAL:
        want = BeautifulSoup(html, "lxml").get_text(separator=" ", strip=True)
        got = parse_html(html).get_text(separator=" ", strip=True)
        assert got == want, html[:200]


def test_get_text_raw_matches_bs4():
    from bs4 import BeautifulSoup

    for html in _pages() + ADVERSARIAL:
        want = BeautifulSoup(html, "lxml").get_text()
        got = parse_html(html).get_text()
        assert got == want, html[:200]


def test_find_all_attrs_match_bs4():
    from bs4 import BeautifulSoup

    for html in _pages():
        soup = BeautifulSoup(html, "lxml")
        doc = parse_html(html)
        for tag in ("a", "img", "meta", "table"):
            want = [dict(el.attrs) for el in soup.find_all(tag)]
            got = [dict(el.attrs) for el in doc.find_all(tag)]
            # bs4 parses multi-valued attrs (class) into lists; htmlx keeps
            # strings — normalize before comparing
            for w in want:
                for k, v in w.items():
                    if isinstance(v, list):
                        w[k] = " ".join(v)
            assert got == want, html[:200]
