"""Raw-NIND downloader — the mirror of /root/reference/scripts/
get_rnind_dset.py: fetch the Raw Natural Image Noise Dataset from the
UCLouvain dataverse (DOI 10.14428/DVN/DEQCIM).

The reference uses the pyDataverse client (undeclared dependency,
get_rnind_dset.py:8-37); this version talks to the Dataverse native API
with plain ``requests`` so no extra package is needed. Network required.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

BASE_URL = "https://dataverse.uclouvain.be"
DOI = "doi:10.14428/DVN/DEQCIM"


def main():
    parser = argparse.ArgumentParser(description="Download the Raw-NIND dataset")
    parser.add_argument("--target_dir", "-t", default="datasets/RawNIND")
    parser.add_argument("--filter", "-f", default=None,
                        help="only files whose name contains this substring")
    args = parser.parse_args()

    try:
        import requests
    except ImportError:
        sys.exit("the downloader needs the 'requests' package")

    target = Path(args.target_dir)
    target.mkdir(parents=True, exist_ok=True)

    resp = requests.get(
        f"{BASE_URL}/api/datasets/:persistentId",
        params={"persistentId": DOI},
        timeout=60,
    )
    resp.raise_for_status()
    files = resp.json()["data"]["latestVersion"]["files"]
    print(f"dataset lists {len(files)} files")
    for entry in files:
        df = entry["dataFile"]
        name = df["filename"]
        if args.filter and args.filter not in name:
            continue
        dest = target / name
        if dest.exists() and dest.stat().st_size == df.get("filesize", -1):
            print(f"ok (cached): {name}")
            continue
        print(f"downloading {name} ({df.get('filesize', '?')} bytes)")
        with requests.get(
            f"{BASE_URL}/api/access/datafile/{df['id']}", stream=True, timeout=600
        ) as r:
            r.raise_for_status()
            with open(dest, "wb") as f:
                for chunk in r.iter_content(1 << 20):
                    f.write(chunk)
    print("Raw-NIND download complete")


if __name__ == "__main__":
    main()
