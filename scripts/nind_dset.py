"""NIND dataset downloader — the mirror of /root/reference/scripts/
nind_dset.py: fetch the Natural Image Noise Dataset image sets from the
Wikimedia Commons API with sha1 validation and retry.

Network access is required (this build environment has none, so the script
is exercised only for its manifest/validation logic in tests). The full
126-scene / 836-file manifest is ported from the reference's hardcoded
table (nind_dset.py:12-160); restrict with ``--sets2dl``, pin a snapshot
with ``--datelimit``, or pass ``--manifest`` for a custom JSON
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

# The reference's last manifest snapshot date (nind_dset.py:12); pass
# --datelimit to pin a different dataset version.
LAST_UPDATE = "2021-07-17"

# Full scene/ISO manifest, ported verbatim from the reference's hardcoded
# table (/root/reference/scripts/nind_dset.py:13-160 — constant data, 126
# scenes / 836 files across 7 camera sets). Each entry is
# "<scene>,<iso1>,<iso2>,..."; Commons titles follow the pattern
# File:NIND_<scene>_ISO<iso>.<ext>.
NIND_IMAGE_SETS = {
    'XT1_8bit': {
        'ext': 'jpg',
        'images': [
            'droid,200,800,3200,6400',
            'gnome,200,800,1600,6400',
            'Ottignies,200,640,3200,6400',
            'MuseeL-turtle,200,800,1250,6400',
            'MuseeL-centrifuge,200,800,2000,6400',
            'MuseeL-shell,200,400,800,6400',
            'MuseeL-coral,200,800,5000,6400',
            'MuseeL-head,200,640,3200,6400',
            'MuseeL-heads,200,400,3200,6400',
            'MuseeL-mask,200,640,4000,6400',
            'MuseeL-pig,200,500,2000,6400',
            'MuseeL-inspiredlotus,200,640,2500,6400',
            'MuseeL-pinklotus,200,800,4000,6400',
            'MuseeL-Armlessness,200,800,2000,6400',
            'MuseeL-byMarcGroessens,200,400,3200,6400',
            'MuseeL-Moschophore,200,500,4000,6400',
            'MuseeL-AraPacis,200,800,4000,6400',
            'MuseeL-stele,200,640,1000,6400',
            'MuseeL-cross,200,500,4000,6400',
            'MuseeL-fuite,200,320,4000,6400',
            'MuseeL-RGB,200,250,1000,6400',
            'MuseeL-Vincent,200,400,2500,6400',
            'MuseeL-ambon,200,640,2500,6400',
            'MuseeL-ram,200,800,1000,6400',
            'MuseeL-pedestal,200,1250,5000,6400',
            'MuseeL-theatre,200,400,2500,6400',
            'MuseeL-text,200,400,5000,6400',
            'MuseeL-painting,200,800,3200,6400',
            'MuseeL-yombe,200,640,3200,6400',
            'MuseeL-hanging,200,500,4000,6400',
            'MuseeL-snakeAndMask,200,2000,6400,H1',
            'MuseeL-coral2,200,6400,H1,H2',
            'MuseeL-Vanillekipferl,200,6400,H1',
            'MuseeL-clam,200,6400,H1',
            'MuseeL-Ndengese,200,6400,H1',
            'MuseeL-Bobo,200,2500,6400,H1,H2',
            'threebicycles,200,6400',
            'sevenbicycles,200,1600,6400',
            'Stevin,200,4000,6400',
            'wall,200,640,6400',
            'Saint-Remi,200,6400,H1,H2,H3',
            'Saint-Remi-C,200,6400,H1,H2',
            'books,200,1600,6400,H1,H2',
            'bloop,200,3200,6400,H1',
            'schooltop,200,800,6400,H1,H2',
            'Sint-Joris,200,1000,2500,6400,H1,H2,H3',
            'claycreature,200,4000,6400,H1',
            'claycreatures,200,1600,5000,6400,H1,H2,H3',
            'claytools,200,5000,6400,H1,H2,H3',
            'CourtineDeVillersDebris,200,2500,6400,H1,H2',
            'Leonidas,200,400,3200,6400,H1',
            'pastries,200,3200,6400,H1,H2',
            'mugshot,200,6400,H1',
            'holywater,200,1600,4000,6400,H1,H2,H3',
            'chapel,200,1000,6400,H1,H2,H3',
            'directions,200,640,640-2,1250,6400,6400-2,H1,H2,H3',
            'drowning,200,800,6400,H1,H2,H3',
            'parking-keyboard,200,400,800,1600,3200,6400,H1,H2,H3',
            'semicircle,200,320,640,1250,2500,5000,6400,H1,H2,H3',
            'stairs,200,250,320,640,1250,2500,5000,6400,H1,H2',
            'stefantiek,200,250,500,2000,6400,H1,H2',
            'tree1,200,400,1600,3200,6400,H1,H2,H3',
            'tree2,200,800,1600,3200,6400,H1,H2,H3',
            'ursulines-building,200,250,400,1000,4000,6400,H1',
            'ursulines-can,200,200-2,400,800,1600,3200,6400,H1,H2',
            'ursulines-red,200,250,500,4000,6400,H1,H2',
            'vlc,200,250,500,1000,3200,6400,H1,H2,H3',
            'whistle,200,250,500,1000,2000,4000,6400,H1,H2,H3,H4',
            'Homarus-americanus,200,200-2,250,400,800,2000,3200,5000,6400,H1,H2',
            'fruits,200,200-2,800,3200,5000,6400',
            'MVB-Sainte-Anne,200,200-2,250,640,4000,6400,H1',
            'MVB-JardinBotanique,200,200-2,400,1000,2500,3200,6400',
            'MVB-Urania,200,320,500,1000,2500,5000,6400,H1,H2',
            'MVB-1887GrandPlace,200,200-2,400,640,2000,5000,6400,H1,H2',
            'MVB-heraldicLion,200,200-2,320,1000,3200,6400,H1,H2',
            'MVB-LouveFire,200,200-2,400,800,1600,3200,6400,6400-2,H1,H2',
            'MVB-Bombardement,200,200-2,320,800,5000,6400,H1,H2,H3',
            'beads,200,500,1000,3200,6400',
            'shells,200,200-2,250,320,1000,1600,2500,3200,5000,6400,H1,H2,H3',
        ],
    },
    'XT1_16bit': {
        'ext': 'png',
        'images': [
            'soap,200,200-2,400,800,3200,6400,H1,H2,H3,H4',
            'kibbles,200,200-2,800,5000,6400,H1,H2,H3',
            'bertrixtree,200,400,640,2500,4000,6400,H1',
            'BruegelLibraryS1,200,400,1000,2500,3200,5000,6400,H1,H2',
            'BruegelLibraryS2,200,500,1250,2500,5000,6400,H1,H2,H3,H4',
            'LaptopInLibrary,200,500,800,1600,2500,6400,H1,H2,H3',
            'banana,200,250,500,800,1250,2000,4000,6400,H1,H2,H3',
            'dustyrubberduck,200,1000,1250,2500,5000,6400,H1,H2',
            'partiallyeatenbanana,200,640,1250,2500,4000,5000,6400,H1,H2,H3',
            'corkboard,200,320,1000,2500,5000,6400,H1,H2,H3',
            'fireextinguisher,200,200-2,200-3,800,3200,6400,H1,H2,H3',
            'colorscreen,200,201,202,400,1000,3200,6400,H1',
        ],
    },
    'C500D_8bit': {
        'ext': 'jpg',
        'images': [
            'MuseeL-Bobo-C500D,100,200,400,800,1600,3200,H1',
            'MuseeL-yombe-C500D,100,400,800,1600,3200,H1',
            'MuseeL-sol-C500D,100,200,400,800,3200,H1',
            'MuseeL-skull-C500D,100,200,400,800,1600,3200,H1',
            'MuseeL-Sepik-C500D,100,200,800,1600,3200,H1',
            'MuseeL-Saint-Pierre-C500D,100,100-2,200,400,800,1600,3200,H1',
            'MuseeL-mammal-C500D,100,200,400,800,1600,3200,H1',
            'MuseeL-idole-C500D,100,100-2,200,400,800,3200,H1',
            'MuseeL-CopteArch-C500D,100,100-2,200,400,1600,3200',
            'MuseeL-cross-C500D,100,200,400,800,1600,3200,H1',
            'MuseeL-fuite-C500D,100,200,400,800,1600,3200,H1',
        ],
    },
    'Z6_16bit': {
        'ext': 'png',
        'images': [
            'sewingmachine,50,63,79,100,125,160,200,400,800,3200,6400,12800,25600,32000,51200',
            'bananapi,50,63,100,125,200,400,800,1600,3200,6400,12800,25600,51200',
            'couch,50,63,79,100,160,250,400,800,1600,3200,5000,10000,16000,25600,40000',
        ],
    },
    'Peter_16bit': {
        'ext': 'png',
        'images': [
            'Bark,100,200,400,800,1600,3200,6400,12800,25600,51200,65535',
            'Blombukett,100,200,400,800,1600,3200,6400,12800,25600,51200,65535',
            'Elplint,100,200,400,800,1600,3200,6400,12800,25600,51200,65535',
            'Kortlek,100,200,400,800,1600,3200,6400,12800,25600,51200,65535',
            'Kyckling-i-kruka,100,200,400,800,1600,3200,6400,12800,25600,51200,65535',
            'Metalldel,100,200,400,800,1600,3200,6400,12800,25600,51200,65535',
            'Spydercheckr,100,200,400,800,1600,3200,6400,12800,25600,51200,65535',
            'Vaxt-i-trad,100,200,400,800,1600,3200',
            '7D-1,100,200,400,800,1600,3200,6400,12800',
            '7D-2,100,200,400,800,1600,3200,6400,12800',
            '7D-3,100,200,400,800,1600,3200,6400,12800',
            '7D-4,100,200,400,800,1600,3200,6400,12800',
            '7D-5,100,200,400,800,1600,3200,6400,12800',
            '7D-6,100,200,400,800,1600,3200,6400,12800',
            '7D-7,100,200,400,800,1600,3200,6400,12800',
            'D60-1,100,200,400,800,1037',
            'D60-2,100,200,400,800,1037',
            'D60-3,100,200,400,800,1037',
        ],
    },
    'Contrib': {
        'ext': 'jpg',
        'images': [
            'Pen-pile,100,200,400,800,1600,3200',
        ],
    },
    'ContribPNG': {
        'ext': 'png',
        'images': [
            'Iain01,200,200-2,200-3,200-4,400,800,1600,3200',
            'Iain02,200,200-2,200-3,200-4,400,800,1600,3200',
        ],
    },
}


def build_manifest(sets2dl=None):
    """scene -> list of Commons titles, optionally restricted to named sets."""
    sets = sets2dl if sets2dl else list(NIND_IMAGE_SETS)
    out = {}
    for aset in sets:
        if aset not in NIND_IMAGE_SETS:
            raise KeyError(f"unknown image set {aset!r}; have {list(NIND_IMAGE_SETS)}")
        ext = NIND_IMAGE_SETS[aset]["ext"]
        for entry in NIND_IMAGE_SETS[aset]["images"]:
            scene, *isos = entry.split(",")
            out.setdefault(scene, []).extend(
                f"File:NIND_{scene}_ISO{iso}.{ext}" for iso in isos
            )
    return out


def sha1_of(path: Path) -> str:
    h = hashlib.sha1()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def query_image_info(titles, session, datelimit=None):
    """Commons API imageinfo query: url + sha1 per title (optionally the
    latest revision no newer than ``datelimit`` — the reference's version
    pin, nind_dset.py iistart)."""
    params = {
        "action": "query",
        "prop": "imageinfo",
        "iiprop": "timestamp|url|sha1",
        "titles": "|".join(titles),
        "format": "json",
    }
    if datelimit:
        params["iistart"] = datelimit + "T23:59:59Z"
    resp = session.get(COMMONS_API, params=params, timeout=60)
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
    parser.add_argument("--sets2dl", nargs="*", default=None,
                        help="image sets to download (default: all)")
    parser.add_argument("--datelimit", default=LAST_UPDATE,
                        help="latest Commons upload date (dataset version pin)")
    args = parser.parse_args()

    try:
        import requests
    except ImportError:
        sys.exit("the downloader needs the 'requests' package")

    manifest = build_manifest(args.sets2dl)
    if args.manifest:
        manifest = json.load(open(args.manifest))

    session = requests.Session()
    session.headers["User-Agent"] = "tad-tpu-nind-downloader/0.1"
    root = Path(args.target_dir)
    failures = []
    for scene, titles in manifest.items():
        scene_dir = root / scene
        scene_dir.mkdir(parents=True, exist_ok=True)
        infos = query_image_info(titles, session, args.datelimit)
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
