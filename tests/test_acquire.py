"""S14 acquisition flow, end-to-end OFFLINE: a fake MODIS archive tree
served over file:// URLs (the reference tests against create_fake_hdf
the same way) — mirror, parse, diff, atomic download, idempotence."""

from __future__ import annotations

import os

import pytest

from rastercube_spark.sources.acquire import (
    available_from_mirror,
    download_one,
    extract_dates_from_index,
    missing_files,
    mirror_date_pages,
    parse_hdf_links,
    sync_archive,
)

DATES = ["2016.01.17", "2016.02.02"]
FILES = {
    "2016.01.17": [
        "MOD13Q1.A2016017.h10v08.005.2016034145345.hdf",
        "MOD13Q1.A2016017.h10v09.005.2016034145346.hdf",
    ],
    "2016.02.02": [
        "MOD13Q1.A2016033.h10v08.005.2016050000000.hdf",
    ],
}


@pytest.fixture
def archive(tmp_path):
    root = tmp_path / "www"
    for date, files in FILES.items():
        d = root / date
        d.mkdir(parents=True)
        links = "".join(f'<a href="{f}">{f}</a>\n' for f in files)
        (d / "index.html").write_text(f"<html>{links}</html>")
        for f in files:
            (d / f).write_bytes(b"HDF:" + f.encode())
    index = "".join(f'<a href="{d}/">{d}/</a>\n' for d in DATES)
    (root / "index.html").write_text(f"<html>{index}</html>")
    return f"{root.as_uri()}/", root


def test_parse_index_and_date_pages(archive):
    url, root = archive
    html = (root / "index.html").read_text()
    assert extract_dates_from_index(html) == DATES
    page = (root / DATES[0] / "index.html").read_text()
    got = parse_hdf_links(f"{root.as_uri()}/{DATES[0]}/index.html", page)
    assert [(t, f) for t, f, _ in got] == [
        ("h10v08", FILES[DATES[0]][0]),
        ("h10v09", FILES[DATES[0]][1]),
    ]


def test_sync_archive_end_to_end(tmp_path, archive, monkeypatch):
    url, root = archive
    # file:// has no directory listing; route date-dir fetches to their
    # index.html (exactly what an HTTP server would return)
    import rastercube_spark.sources.acquire as A

    real_fetch = A._fetch

    def fetch(u, op=None):
        if u.endswith("/"):
            u += "index.html"
        return real_fetch(u, op)

    monkeypatch.setattr(A, "_fetch", fetch)

    mirror = str(tmp_path / "mirror")
    hdf_dir = str(tmp_path / "hdf")
    rep = sync_archive(url, mirror, hdf_dir)
    assert rep == {"pages_fetched": 2, "advertised": 3, "downloaded": 3}
    # per-year layout, full content
    p = os.path.join(hdf_dir, "2016", FILES["2016.01.17"][0])
    assert open(p, "rb").read().startswith(b"HDF:")
    # idempotent second pass: nothing mirrored, nothing downloaded
    rep2 = sync_archive(url, mirror, hdf_dir)
    assert rep2 == {"pages_fetched": 0, "advertised": 3, "downloaded": 0}


def test_tile_filter_and_missing(tmp_path, archive, monkeypatch):
    url, root = archive
    import rastercube_spark.sources.acquire as A

    real_fetch = A._fetch
    monkeypatch.setattr(
        A,
        "_fetch",
        lambda u, op=None: real_fetch(
            u + "index.html" if u.endswith("/") else u, op
        ),
    )
    mirror = str(tmp_path / "mirror")
    mirror_date_pages(url, mirror)
    avail = available_from_mirror(url, mirror)
    only = missing_files(avail, str(tmp_path / "hdf"), tiles={"h10v09"})
    assert len(only) == 1 and only[0][1].endswith(
        "2016/" + FILES["2016.01.17"][1]
    )


def test_truncated_listing_raises(tmp_path, archive, monkeypatch):
    url, root = archive
    (root / DATES[0] / "index.html").write_text("<html>partial")
    import rastercube_spark.sources.acquire as A

    real_fetch = A._fetch
    monkeypatch.setattr(
        A,
        "_fetch",
        lambda u, op=None: real_fetch(
            u + "index.html" if u.endswith("/") else u, op
        ),
    )
    with pytest.raises(IOError, match="truncated"):
        mirror_date_pages(url, str(tmp_path / "mirror"))


def test_download_retries_then_fails(tmp_path):
    with pytest.raises(IOError, match="after 2 tries"):
        download_one(
            "file:///nonexistent/nope.hdf",
            str(tmp_path / "x" / "nope.hdf"),
            retries=2,
            backoff_s=0.0,
        )


def test_opener_registers_credentials_for_real_urls():
    """ADVICE r05 (medium): add_password(None, "https://", ...) parses
    to an empty authority and never matches a real URL — the opener must
    register against the actual archive URL and the Earthdata host."""
    import urllib.request

    from rastercube_spark.sources.acquire import EARTHDATA_URL, opener

    base = "https://e4ftl01.cr.usgs.gov/MOLT/MOD13Q1.006/"
    op = opener("user", "secret", base_url=base)
    auth = [
        h for h in op.handlers
        if isinstance(h, urllib.request.HTTPBasicAuthHandler)
    ]
    cookies = [
        h for h in op.handlers
        if isinstance(h, urllib.request.HTTPCookieProcessor)
    ]
    assert auth and cookies, "need basic-auth AND cookie handlers"
    mgr = auth[0].passwd
    assert mgr.find_user_password(None, base + "2016.01.01/") == (
        "user",
        "secret",
    )
    assert mgr.find_user_password(None, EARTHDATA_URL + "oauth/authorize") == (
        "user",
        "secret",
    )
    # the r05 bug shape: nothing registered ⇒ (None, None)
    assert mgr.find_user_password(None, "https://other.example.com/") == (
        None,
        None,
    )


def test_authenticated_fetch_presents_credentials(tmp_path):
    """End-to-end over a real localhost HTTP exchange: the server 401s
    with a Basic challenge; the opener must retry WITH the Authorization
    header (the r05 opener sent none and died on the 401)."""
    import base64
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from rastercube_spark.sources.acquire import _fetch, opener

    expected = "Basic " + base64.b64encode(b"user:secret").decode()
    seen: list[str | None] = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            got = self.headers.get("Authorization")
            seen.append(got)
            if got != expected:
                self.send_response(401)
                self.send_header("WWW-Authenticate", 'Basic realm="x"')
                self.end_headers()
                return
            body = b"<html>ok</html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}/"
        op = opener("user", "secret", base_url=base)
        assert _fetch(base + "data.hdf", op) == b"<html>ok</html>"
    finally:
        srv.shutdown()
        t.join(timeout=5)
    assert expected in seen, "credentials were never presented"
