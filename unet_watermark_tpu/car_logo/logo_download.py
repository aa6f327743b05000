"""Logo scraper — analog of /root/reference/src/car_logo/logo_download.py.

Downloads car-logo images from a listing page (requests + bs4). Kept for
API completeness; on a zero-egress pod every request fails gracefully and
the function reports what it would have fetched."""
from __future__ import annotations

import argparse
import logging
import os
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


def get_car_logos_from_page(url: str) -> List[Dict[str, str]]:
    """Scrape (name, img_url) entries from a page
    (logo_download.py:30 analog)."""
    try:
        import requests
        from bs4 import BeautifulSoup
    except ImportError as e:
        logger.error("scraper deps missing: %s", e)
        return []
    try:
        resp = requests.get(url, timeout=15, headers={
            "User-Agent": "Mozilla/5.0 (logo-dataset-builder)"})
        resp.raise_for_status()
    except Exception as e:  # noqa: BLE001
        logger.error("fetch failed (offline?): %s", e)
        return []
    soup = BeautifulSoup(resp.text, "html.parser")
    out = []
    for img in soup.find_all("img"):
        src = img.get("src") or img.get("data-src")
        if not src:
            continue
        name = (img.get("alt") or os.path.splitext(
            os.path.basename(src))[0]).strip()
        if any(k in (name + src).lower() for k in ("logo", "badge",
                                                   "emblem")):
            out.append({"name": name, "url": src})
    return out


def download_logos(url: str, output_dir: str,
                   limit: Optional[int] = None) -> Dict[str, int]:
    os.makedirs(output_dir, exist_ok=True)
    entries = get_car_logos_from_page(url)
    if limit:
        entries = entries[:limit]
    ok = failed = 0
    try:
        import requests
    except ImportError:
        return {"found": len(entries), "downloaded": 0,
                "failed": len(entries)}
    for e in entries:
        try:
            r = requests.get(e["url"], timeout=15)
            r.raise_for_status()
            safe = "".join(c if c.isalnum() or c in "-_" else "_"
                           for c in e["name"])[:64] or "logo"
            with open(os.path.join(output_dir, f"{safe}.png"), "wb") as f:
                f.write(r.content)
            ok += 1
        except Exception as ex:  # noqa: BLE001
            logger.warning("download failed %s: %s", e["url"], ex)
            failed += 1
    return {"found": len(entries), "downloaded": ok, "failed": failed}


def main(argv=None):
    p = argparse.ArgumentParser(description="car logo scraper")
    p.add_argument("--url", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--limit", type=int)
    args = p.parse_args(argv)
    print(download_logos(args.url, args.output, args.limit))


if __name__ == "__main__":
    main()
