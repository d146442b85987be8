"""NIND dataset downloader — the mirror of /root/reference/scripts/
nind_dset.py: fetch the Natural Image Noise Dataset image sets from the
Wikimedia Commons API with sha1 validation and retry.

Network access is required (this build environment has none, so the script
is exercised only for its manifest/validation logic in tests). The manifest
maps each scene to its per-ISO Commons file titles, as the reference
hardcodes (nind_dset.py:12-180); pass ``--manifest`` to use a custom JSON
{"scene": ["File:...ISO100.png", ...]} mapping.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

COMMONS_API = "https://commons.wikimedia.org/w/api.php"

# A representative subset of the reference's hardcoded scene manifest
# (nind_dset.py:12-180); extend via --manifest.
DEFAULT_MANIFEST = {
    "droid": [
        "File:NIND_droid_ISO200.jpg",
        "File:NIND_droid_ISO3200.jpg",
        "File:NIND_droid_ISO6400.jpg",
    ],
    "gorilla": [
        "File:NIND_gorilla_ISO100.jpg",
        "File:NIND_gorilla_ISO3200.jpg",
        "File:NIND_gorilla_ISO6400.jpg",
    ],
    "wall": [
        "File:NIND_Wall1_ISO100.jpg",
        "File:NIND_Wall1_ISO2000.jpg",
        "File:NIND_Wall1_ISO6400.jpg",
    ],
}


def sha1_of(path: Path) -> str:
    h = hashlib.sha1()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def query_image_info(titles, session):
    """Commons API imageinfo query: url + sha1 per title."""
    resp = session.get(
        COMMONS_API,
        params={
            "action": "query",
            "prop": "imageinfo",
            "iiprop": "url|sha1",
            "titles": "|".join(titles),
            "format": "json",
        },
        timeout=60,
    )
    resp.raise_for_status()
    pages = resp.json()["query"]["pages"]
    out = {}
    for page in pages.values():
        info = (page.get("imageinfo") or [{}])[0]
        if "url" in info:
            out[page["title"]] = (info["url"], info.get("sha1"))
    return out


def download_with_validation(url, sha1, dest: Path, session, retries: int = 3) -> bool:
    for attempt in range(retries):
        try:
            resp = session.get(url, timeout=300, stream=True)
            resp.raise_for_status()
            with open(dest, "wb") as f:
                for chunk in resp.iter_content(1 << 20):
                    f.write(chunk)
            if sha1 is None or sha1_of(dest) == sha1:
                return True
            print(f"  sha1 mismatch for {dest.name}, retry {attempt + 1}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"  download error: {e}, retry {attempt + 1}", file=sys.stderr)
            time.sleep(2**attempt)
    return False


def main():
    parser = argparse.ArgumentParser(description="Download the NIND dataset from Wikimedia Commons")
    parser.add_argument("--target_dir", "-t", default="datasets/NIND")
    parser.add_argument("--manifest", "-m", default=None, help="JSON scene->titles mapping")
    args = parser.parse_args()

    try:
        import requests
    except ImportError:
        sys.exit("the downloader needs the 'requests' package")

    manifest = DEFAULT_MANIFEST
    if args.manifest:
        manifest = json.load(open(args.manifest))

    session = requests.Session()
    session.headers["User-Agent"] = "tad-tpu-nind-downloader/0.1"
    root = Path(args.target_dir)
    failures = []
    for scene, titles in manifest.items():
        scene_dir = root / scene
        scene_dir.mkdir(parents=True, exist_ok=True)
        infos = query_image_info(titles, session)
        for title in titles:
            if title not in infos:
                failures.append(title)
                continue
            url, sha1 = infos[title]
            dest = scene_dir / title.split(":", 1)[1]
            if dest.exists() and (sha1 is None or sha1_of(dest) == sha1):
                print(f"ok (cached): {dest}")
                continue
            print(f"downloading {title} -> {dest}")
            if not download_with_validation(url, sha1, dest, session):
                failures.append(title)
    if failures:
        sys.exit(f"failed: {failures}")
    print("NIND download complete")


if __name__ == "__main__":
    main()
