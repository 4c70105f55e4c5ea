"""Per-day data-ref resolver with local-mirror cache — the reference's
`TradeResolver` / `LocalMirrorCache` (marketdb-loader/.../TradeResolver.
scala:10-57, DataRef.scala:29-110: resolve a trading day's archive locally
first, then from a remote URL, caching remote downloads into the local
mirror).

This is an ingestion *utility* (plain Python on the driver, SURVEY §2A S4
"not an engine operator"): it produces local file paths that the Spark
sources (rts_csv.read_rts_zip) then scan in parallel. Network access is
optional and gated — tests exercise the local + file:// paths only.
"""

from __future__ import annotations

import shutil
import urllib.parse
import urllib.request
from datetime import date
from pathlib import Path

# Reference naming: FT<yymmdd>.zip for the futures trades archive
# (marketdb-loader fixture data/FT120201.zip, TradeDataIterateeTest).
def day_archive_name(day: date, prefix: str = "FT") -> str:
    return f"{prefix}{day.strftime('%y%m%d')}.zip"


class RefResolver:
    """local-dir ≺ remote-url resolution with mirror caching.

    resolve(day) returns a local Path or None (the reference's
    `local <+> ftp` alternative fallback, TradeResolver.scala:10-57)."""

    def __init__(self, mirror_dir: str, remote_base: str | None = None) -> None:
        self.mirror = Path(mirror_dir)
        self.mirror.mkdir(parents=True, exist_ok=True)
        self.remote_base = remote_base.rstrip("/") if remote_base else None

    def resolve(self, day: date, prefix: str = "FT") -> Path | None:
        name = day_archive_name(day, prefix)
        local = self.mirror / name
        if local.exists():
            return local
        if self.remote_base is None:
            return None
        url = f"{self.remote_base}/{name}"
        try:
            # download into the mirror (DataRef.scala:70-110), atomically:
            # partial downloads must not be resolvable as cached archives
            tmp = local.with_suffix(".part")
            with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
                shutil.copyfileobj(resp, out)
            tmp.rename(local)
            return local
        except (urllib.error.URLError, OSError):
            return None

    def resolve_interval(
        self, start: date, end: date, prefix: str = "FT"
    ) -> dict[date, Path | None]:
        """Interval.toDays expansion (Implicits.scala:12-26) driving the
        per-day resolution loop (Loader.scala:43-49)."""
        from datetime import timedelta

        out: dict[date, Path | None] = {}
        d = start
        while d <= end:
            out[d] = self.resolve(d, prefix)
            d += timedelta(days=1)
        return out
