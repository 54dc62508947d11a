"""Landing-source tests: permissive CSV scan with corrupt-record
capture (S4), tolerant projection (P5), xlsx shim gating (S3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.landing import (
    read_landing_csv,
    tolerant_select,
    xlsx_to_landing_csv,
)


def test_permissive_csv_captures_corrupt_rows(spark, tmp_path):
    p = tmp_path / "landing.csv"
    p.write_text("a,b\n1,2\n3,4,EXTRA,JUNK\n5,6\n")
    df = read_landing_csv(spark, str(p), "a int, b int")
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "EXTRA" in bad[0]["_corrupt_record"]
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert {(r["a"], r["b"]) for r in good} == {(1, 2), (5, 6)}


def test_tolerant_select_handles_drifting_schema(spark):
    df = spark.createDataFrame(
        [("O1", "x", "extra")], "`Order ID` string, Products string, Unexpected string"
    )
    out = tolerant_select(df)
    assert out.columns == ["Order ID", "Products"]  # wanted ∩ present, in order


def test_xlsx_shim_skips_unreadable_file(tmp_path):
    # S4 per-file skip: an unreadable drop returns None, never raises
    # (full conversion coverage lives in tests/test_xlsx.py).
    fake = tmp_path / "drop.xlsx"
    fake.write_bytes(b"not a real xlsx")
    assert xlsx_to_landing_csv(str(fake), str(tmp_path)) is None


def test_object_sync_idempotent_and_atomic(tmp_path):
    """The Drive-poll shape (ref main.py:414-440) as an idempotent
    sync job: new files land once, re-runs are no-ops, crash replay
    cannot duplicate, and nothing half-written is ever visible."""
    import os

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        LocalDirFetcher,
        sync_to_landing,
        synced_names,
    )

    remote = tmp_path / "remote"
    landing = tmp_path / "landing"
    remote.mkdir()
    (remote / "a.csv").write_bytes(b"a-bytes")
    (remote / "b.csv").write_bytes(b"b-bytes")

    fetcher = LocalDirFetcher(str(remote))
    assert sync_to_landing(fetcher, str(landing)) == ["a.csv", "b.csv"]
    assert sync_to_landing(fetcher, str(landing)) == []  # idempotent
    assert (landing / "a.csv").read_bytes() == b"a-bytes"

    # new remote file: only it lands
    (remote / "c.csv").write_bytes(b"c-bytes")
    assert sync_to_landing(fetcher, str(landing)) == ["c.csv"]
    assert synced_names(str(landing)) == {"a.csv", "b.csv", "c.csv"}

    # crash simulation: manifest lost a line but the file landed →
    # re-sync overwrites in place (same name), never duplicates
    manifest = landing / "_synced.manifest"
    manifest.write_text("a.csv\nb.csv\n")
    assert sync_to_landing(fetcher, str(landing)) == ["c.csv"]
    assert sorted(f for f in os.listdir(landing) if not f.startswith("_")) == [
        "a.csv", "b.csv", "c.csv",
    ]
    # no temp droppings
    assert not [f for f in os.listdir(landing) if ".tmp-" in f]

    # temps are DOT-prefixed (hidden from Hadoop file sources); a
    # crash-orphaned OLD temp is swept by the next pass, while a YOUNG
    # temp (a concurrent pass's in-flight file) is left alone
    import time

    orphan = landing / ".tmp-deadbeef-x.csv"
    orphan.write_bytes(b"half-written")
    os.utime(orphan, (time.time() - 7200, time.time() - 7200))  # 2h old
    young = landing / ".tmp-cafebabe-y.csv"
    young.write_bytes(b"in-flight")
    (remote / "d.csv").write_bytes(b"d-bytes")
    assert sync_to_landing(fetcher, str(landing)) == ["d.csv"]
    assert not orphan.exists()
    assert young.exists()  # overlap-safe: never sweep a live temp
    young.unlink()
    # nothing the streaming source would list is ever non-final:
    visible = [f for f in os.listdir(landing) if not f.startswith((".", "_"))]
    assert sorted(visible) == ["a.csv", "b.csv", "c.csv", "d.csv"]


def test_object_sync_rename_collision_refused(tmp_path):
    """Two distinct remote files mapping to one out_name must refuse
    loudly — silently overwriting loses one file's bytes while both
    are marked synced (ADVICE r4)."""
    import pytest

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        LocalDirFetcher,
        sync_to_landing,
        synced_names,
    )

    remote, landing = tmp_path / "remote", tmp_path / "landing"
    remote.mkdir()
    (remote / "2024-report.csv").write_bytes(b"jan")
    (remote / "2025-report.csv").write_bytes(b"feb")
    fetcher = LocalDirFetcher(str(remote))
    squash = lambda name: "report.csv"  # noqa: E731
    with pytest.raises(ValueError, match="collision"):
        sync_to_landing(fetcher, str(landing), rename=squash)
    # the first file landed and is marked; the second is NOT marked
    # synced, so fixing the rename lands it on the next pass
    assert synced_names(str(landing)) == {"2024-report.csv"}
    assert (landing / "report.csv").read_bytes() == b"jan"
    landed = sync_to_landing(fetcher, str(landing), rename=lambda n: n)
    assert landed == ["2025-report.csv"]
    assert (landing / "2025-report.csv").read_bytes() == b"feb"


class _DriveStub:
    """Local http.server speaking the Drive v3 REST shape: paginated
    files().list + alt=media downloads, plus a file that truncates
    mid-transfer (Content-Length larger than the body). With
    ``valid_tokens`` set, any request not carrying ``Bearer <one of
    them>`` is rejected 401 (the expiring-credential leg)."""

    def __init__(
        self, files, page_size=2, truncate_ids=(), valid_tokens=None
    ):
        import http.server
        import json
        import threading
        import urllib.parse

        stub = self
        self.files = files  # [(file_id, name, payload)]
        self.requests = []
        self.rejected = 0  # 401s served (valid_tokens mode)

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                stub.requests.append(self.path)
                if valid_tokens is not None:
                    auth = self.headers.get("Authorization", "")
                    if auth not in {
                        f"Bearer {t}" for t in valid_tokens
                    }:
                        stub.rejected += 1
                        self.send_response(401)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                parsed = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(parsed.query)
                if parsed.path == "/files":
                    start = int(qs.get("pageToken", ["0"])[0])
                    page = stub.files[start : start + page_size]
                    body = {
                        "files": [
                            {"id": fid, "name": name} for fid, name, _ in page
                        ]
                    }
                    if start + page_size < len(stub.files):
                        body["nextPageToken"] = str(start + page_size)
                    data = json.dumps(body).encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                fid = urllib.parse.unquote(parsed.path.rsplit("/", 1)[-1])
                for f, _, payload in stub.files:
                    if f == fid:
                        self.send_response(200)
                        if f in truncate_ids:
                            # lie about the length, then drop the
                            # connection mid-body
                            self.send_header(
                                "Content-Length", str(len(payload) + 100)
                            )
                            self.end_headers()
                            self.wfile.write(payload)
                            self.wfile.flush()
                            self.connection.close()
                        else:
                            self.send_header(
                                "Content-Length", str(len(payload))
                            )
                            self.end_headers()
                            self.wfile.write(payload)
                        return
                self.send_response(404)
                self.end_headers()

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.base_url = f"http://127.0.0.1:{self.server.server_address[1]}"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


def test_drive_rest_fetcher_paginates_and_lands(tmp_path):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        DriveRestFetcher,
        sync_to_landing,
    )

    files = [
        ("id-a", "a.csv", b"aaa"),
        ("id-b", "b.csv", b"bbbb"),
        ("id-c", "c.csv", b"c"),
        ("id-d", "d.csv", b"dd"),
        ("id-e", "e.csv", b"eee"),
    ]
    stub = _DriveStub(files, page_size=2)
    try:
        fetcher = DriveRestFetcher(stub.base_url, "folder123", token="tok")
        listing = fetcher.list()
        assert listing == sorted((n, i) for i, n, _ in files)
        # pagination actually happened: 3 list pages for 5 files
        assert sum(1 for p in stub.requests if p.startswith("/files?")) == 3
        landing = tmp_path / "landing"
        landed = sync_to_landing(fetcher, str(landing))
        assert landed == [n for _, n, _ in sorted(files, key=lambda f: f[1])]
        for _, name, payload in files:
            assert (landing / name).read_bytes() == payload
        assert sync_to_landing(fetcher, str(landing)) == []  # idempotent
    finally:
        stub.stop()


def test_drive_rest_fetcher_truncated_download_never_lands(tmp_path):
    """A connection dropped mid-body (short read vs Content-Length)
    raises; the landing dir gets no final file and no manifest entry,
    so the next pass retries the same file."""
    import pytest

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        DriveRestFetcher,
        sync_to_landing,
        synced_names,
    )

    import http.client

    files = [("id-a", "a.csv", b"good"), ("id-b", "b.csv", b"torn-payload")]
    stub = _DriveStub(files, truncate_ids={"id-b"})
    try:
        fetcher = DriveRestFetcher(stub.base_url, "folder123")
        landing = tmp_path / "landing"
        # urllib surfaces the tear as IncompleteRead; if a server lies
        # without dropping, the fetcher's own length check raises OSError
        with pytest.raises((OSError, http.client.HTTPException)):
            sync_to_landing(fetcher, str(landing))
        assert (landing / "a.csv").read_bytes() == b"good"  # landed before the tear
        assert not (landing / "b.csv").exists()
        assert synced_names(str(landing)) == {"a.csv"}
        # server heals → retry lands ONLY the previously-torn file
        stub2 = _DriveStub(files)
        try:
            healed = DriveRestFetcher(stub2.base_url, "folder123")
            assert sync_to_landing(healed, str(landing)) == ["b.csv"]
            assert (landing / "b.csv").read_bytes() == b"torn-payload"
        finally:
            stub2.stop()
    finally:
        stub.stop()


def test_drive_rest_fetcher_token_refresh_on_401(tmp_path):
    """Expiring-credential flow (VERDICT r8 #8): the provider's first
    token is already stale when the first request goes out; the 401
    triggers exactly one refresh, the retry lands the file exactly
    once, and every later request reuses the fresh token without
    further provider calls or 401s."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        DriveRestFetcher,
        sync_to_landing,
    )

    files = [("id-a", "a.csv", b"aaa"), ("id-b", "b.csv", b"bb")]
    stub = _DriveStub(files, valid_tokens={"fresh"})
    calls = []

    def provider():
        calls.append(None)
        return "stale" if len(calls) == 1 else "fresh"

    try:
        fetcher = DriveRestFetcher(
            stub.base_url, "folder123", token_provider=provider
        )
        landing = tmp_path / "landing"
        landed = sync_to_landing(fetcher, str(landing))
        assert landed == ["a.csv", "b.csv"]
        assert (landing / "a.csv").read_bytes() == b"aaa"
        assert (landing / "b.csv").read_bytes() == b"bb"
        # one lazy call + one refresh; the fresh token then serves the
        # remaining list page(s) and both downloads with no more 401s
        assert len(calls) == 2
        assert stub.rejected == 1
    finally:
        stub.stop()


def test_drive_rest_fetcher_second_401_propagates():
    """A refreshed-but-still-rejected token is a config error: the
    fetcher retries ONCE, then surfaces the 401 (no retry loop)."""
    import urllib.error

    import pytest

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        DriveRestFetcher,
    )

    stub = _DriveStub([("id-a", "a.csv", b"x")], valid_tokens=set())
    calls = []

    def provider():
        calls.append(None)
        return f"never-valid-{len(calls)}"

    try:
        fetcher = DriveRestFetcher(
            stub.base_url, "folder123", token_provider=provider
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            fetcher.list()
        assert exc.value.code == 401
        assert len(calls) == 2  # lazy + one refresh, then give up
        assert stub.rejected == 2
    finally:
        stub.stop()


def test_drive_rest_fetcher_static_token_never_retries():
    """A static token 401s straight through — re-sending the same
    bytes cannot succeed, so there's nothing to retry."""
    import urllib.error

    import pytest

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        DriveRestFetcher,
    )

    stub = _DriveStub([("id-a", "a.csv", b"x")], valid_tokens={"other"})
    try:
        fetcher = DriveRestFetcher(
            stub.base_url, "folder123", token="stale"
        )
        with pytest.raises(urllib.error.HTTPError):
            fetcher.list()
        assert stub.rejected == 1  # exactly one attempt
        with pytest.raises(ValueError):
            DriveRestFetcher(
                stub.base_url, "f", token="t", token_provider=lambda: "t"
            )
    finally:
        stub.stop()


def test_object_sync_rejects_unsafe_remote_names(tmp_path):
    """Remote names are untrusted with a network fetcher: traversal
    names must never write outside the landing dir, and control
    characters must never corrupt the manifest — both refuse loudly,
    and rename= is the sanctioned escape hatch."""
    import pytest

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        sync_to_landing,
    )

    class EvilFetcher:
        def __init__(self, names):
            self._names = names

        def list(self):
            return [(n, n) for n in self._names]

        def fetch(self, ref):
            return b"payload"

    landing = tmp_path / "landing"
    outside = tmp_path / "escape.csv"
    with pytest.raises(ValueError, match="unsafe landing name"):
        sync_to_landing(EvilFetcher(["../escape.csv"]), str(landing))
    assert not outside.exists()
    with pytest.raises(ValueError, match="control characters"):
        sync_to_landing(EvilFetcher(["a\tb.csv"]), str(landing))
    with pytest.raises(ValueError, match="unsafe landing name"):
        sync_to_landing(EvilFetcher(["/etc/passwd"]), str(landing))
    # '.'/'_' prefixes would be invisible to the streaming file source
    with pytest.raises(ValueError, match="never be ingested"):
        sync_to_landing(EvilFetcher([".hidden.csv"]), str(landing))
    # rename= maps an unsafe remote name to a safe landing name
    landed = sync_to_landing(
        EvilFetcher(["reports/2026.csv"]),
        str(landing),
        rename=lambda n: n.replace("/", "__"),
    )
    assert landed == ["reports/2026.csv"]
    assert (landing / "reports__2026.csv").read_bytes() == b"payload"
