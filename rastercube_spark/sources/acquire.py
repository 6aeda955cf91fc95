"""MODIS archive acquisition (S14; reference
scripts/ndvi_hdf_download.py:155-383): mirror the archive's per-date
HTML listings, parse available HDF files, diff against the local
per-year tree, download what's missing — atomically, with retries.

Driver-side by design (like the reference): acquisition is IO against a
rate-limited external archive, not a distributed compute problem — the
parallelism that matters afterwards is the ingest
(sources/geotiff.py/hdf4.py ``ingest_tiles`` over ``binaryFile``).

Every fetch goes through ``urllib.request`` and therefore accepts
``file://`` URLs, so the whole flow is tested END-TO-END offline
(tests/test_acquire.py builds a fake archive tree on disk — the same
trick as the reference's create_fake_hdf.py). Real-archive specifics
(Earthdata basic auth) ride on a standard opener and stay out of the
core logic.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import time
import urllib.parse
import urllib.request

# date directories on the archive index: YYYY.MM.DD/
DATE_RE = re.compile(r"(\d{4}\.\d{2}\.\d{2})")
# HDF links on a date page (same name grammar as sources/catalog.py)
HDF_HREF_RE = re.compile(
    r'href="((\w+)\.A(\d{4})(\d{3})\.h(\d{2})v(\d{2})\.(\d{3})\.(\d+)\.hdf)"'
)


# The Earthdata login host: LP DAAC endpoints 302 to it for the actual
# Basic challenge, then 302 back with a session cookie the data host
# requires (the reference's ndvi_hdf_download.py rides the same flow
# through its .netrc/cookie setup).
EARTHDATA_URL = "https://urs.earthdata.nasa.gov/"


def opener(
    user: str | None = None,
    password: str | None = None,
    base_url: str | None = None,
):
    """URL opener; with credentials, an HTTP basic-auth + cookie opener
    (the real LP DAAC archive sits behind Earthdata auth).

    Credentials are registered against the ACTUAL archive URL and the
    Earthdata login host — registering against the bare scheme
    (``"https://"``) parses to an empty authority that
    ``find_user_password`` never matches, so the r05 version silently
    sent no credentials (ADVICE r05 medium). The cookie processor is
    load-bearing too: Earthdata answers the authenticated login with a
    session cookie and redirects back to the data host, which 401s
    again without it."""
    if not user:
        return urllib.request.build_opener()
    import http.cookiejar

    mgr = urllib.request.HTTPPasswordMgrWithDefaultRealm()
    for uri in (base_url, EARTHDATA_URL):
        if uri:
            mgr.add_password(None, uri, user, password or "")
    return urllib.request.build_opener(
        urllib.request.HTTPBasicAuthHandler(mgr),
        urllib.request.HTTPCookieProcessor(http.cookiejar.CookieJar()),
    )


def _fetch(url: str, op=None) -> bytes:
    op = op or urllib.request.build_opener()
    with op.open(url) as r:
        return r.read()


def extract_dates_from_index(html: str) -> list[str]:
    """Date-directory names from the archive index page, sorted.
    (Reference extract_dates_from_modis_index; href scrape without the
    BeautifulSoup dependency — the grammar is a bare YYYY.MM.DD.)"""
    return sorted(set(DATE_RE.findall(html)))


def parse_hdf_links(date_url: str, html: str) -> list[tuple[str, str, str]]:
    """(tile, fname, absolute url) for every HDF link on a date page."""
    out = []
    for m in HDF_HREF_RE.finditer(html):
        fname = m.group(1)
        tile = f"h{m.group(5)}v{m.group(6)}"
        out.append((tile, fname, urllib.parse.urljoin(date_url, fname)))
    return out


def mirror_date_pages(
    base_url: str, mirror_dir: str, op=None, sleep_s: float = 0.0
) -> int:
    """Idempotently mirror each date's listing page to
    ``mirror_dir/<date>.html``; returns how many pages were fetched.
    A date's listing never changes once published (reference
    mirror_modis_dates_html), so existing files are never re-fetched.
    Completeness check: the archive server omits Content-Length, so a
    truncated page is detectable only by its missing ``</html>`` tail —
    partial downloads raise instead of poisoning the cache."""
    if not base_url.endswith("/"):
        base_url += "/"
    os.makedirs(mirror_dir, exist_ok=True)
    index = _fetch(base_url, op).decode("utf-8", errors="replace")
    n = 0
    for date in extract_dates_from_index(index):
        dst = os.path.join(mirror_dir, f"{date}.html")
        if os.path.exists(dst):
            continue
        page = _fetch(urllib.parse.urljoin(base_url, date + "/"), op)
        if b"</html>" not in page[-64:]:
            raise IOError(f"truncated listing for {date} (no </html> tail)")
        with open(dst, "wb") as f:
            f.write(page)
        n += 1
        if sleep_s:
            time.sleep(sleep_s)
    return n


def available_from_mirror(
    base_url: str, mirror_dir: str
) -> list[tuple[str, str, str, str]]:
    """(date, tile, fname, url) for every HDF the mirrored listings
    advertise (reference collect_available_hdf_from_mirror)."""
    if not base_url.endswith("/"):
        base_url += "/"
    out = []
    for fn in sorted(os.listdir(mirror_dir)):
        if not fn.endswith(".html"):
            continue
        date = fn[:-5]
        date_url = urllib.parse.urljoin(base_url, date + "/")
        with open(os.path.join(mirror_dir, fn), encoding="utf-8",
                  errors="replace") as f:
            html = f.read()
        for tile, fname, url in parse_hdf_links(date_url, html):
            out.append((date, tile, fname, url))
    return out


def missing_files(
    available: list[tuple[str, str, str, str]],
    hdf_dir: str,
    tiles: set[str] | None = None,
) -> list[tuple[str, str]]:
    """(url, destination) for advertised files absent from the local
    per-year tree ``hdf_dir/<year>/<fname>`` (the reference's layout;
    year = the A-date year encoded in the filename)."""
    out = []
    for _date, tile, fname, url in available:
        if tiles is not None and tile not in tiles:
            continue
        year = fname.split(".A")[1][:4]
        dst = os.path.join(hdf_dir, year, fname)
        if not os.path.exists(dst):
            out.append((url, dst))
    return out


def download_one(
    url: str, dst: str, op=None, retries: int = 3, backoff_s: float = 0.1
) -> None:
    """Atomic download: fetch to a temp file in the destination
    directory, fsync, rename — a crash never leaves a half-written HDF
    where the ingest's ``binaryFile`` scan would pick it up (reference
    download_url uses the same temp-then-move discipline)."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    last: Exception | None = None
    for attempt in range(retries):
        try:
            data = _fetch(url, op)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dst))
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(data)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, dst)
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
            return
        except Exception as ex:  # noqa: BLE001 - retry any fetch failure
            last = ex
            time.sleep(backoff_s * (2**attempt))
    raise IOError(f"failed to download {url} after {retries} tries: {last}")


def sync_archive(
    base_url: str,
    mirror_dir: str,
    hdf_dir: str,
    tiles: set[str] | None = None,
    user: str | None = None,
    password: str | None = None,
) -> dict:
    """End-to-end acquisition pass: mirror listings → diff → download.
    Idempotent: a second run mirrors nothing and downloads nothing."""
    op = opener(user, password, base_url=base_url)
    n_pages = mirror_date_pages(base_url, mirror_dir, op)
    avail = available_from_mirror(base_url, mirror_dir)
    todo = missing_files(avail, hdf_dir, tiles)
    for url, dst in todo:
        download_one(url, dst, op)
    return {
        "pages_fetched": n_pages,
        "advertised": len(avail),
        "downloaded": len(todo),
    }
