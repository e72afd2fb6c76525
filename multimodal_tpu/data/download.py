"""Dataset downloaders — COCO, CC12M shards, Google-Drive archives.

Counterparts of the reference's acquisition layer: ``CocoDataset.download``
(Datasets/coco.py:105, which shells to a download script), ``CC12mDataset`` HF-hub shard
URL construction (Datasets/cc12m.py:40-51) and TSV fallback (:155),
``download_from_google`` with its confirm-token/HTML-form handling
(Datasets/download_from_google.py:10-120), and ``LaionDataset.download``
(Datasets/laion.py:80-128).

TPU training pods are typically zero-egress; these helpers exist for the data-preparation
host. Every function raises a clear error when the network is unreachable instead of
hanging. requests is imported lazily so the module stays importable offline.
"""

from __future__ import annotations

import json
import logging
import os
import zipfile

log = logging.getLogger(__name__)

COCO_URLS = {
    "train2017": "http://images.cocodataset.org/zips/train2017.zip",
    "val2017": "http://images.cocodataset.org/zips/val2017.zip",
    "annotations": "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
}
CC12M_WDS_URL = "https://huggingface.co/datasets/pixparse/cc12m-wds/resolve/main/cc12m-train-{idx:04d}.tar"
CC12M_NUM_SHARDS = 1243  # pixparse/cc12m-wds shard count (train_sharedCLIP.sh:8)


def _requests():
    import requests

    return requests


def download_file(url: str, dest: str, chunk_size: int = 1 << 20, token: str | None = None,
                  timeout: int = 60) -> str:
    """Stream a URL to disk with a .part temp file and atomic rename."""
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    tmp = dest + ".part"
    with _requests().get(url, stream=True, headers=headers, timeout=timeout) as r:
        r.raise_for_status()
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(chunk_size):
                f.write(chunk)
    os.replace(tmp, dest)
    return dest


def download_coco(root: str, splits=("val2017",), annotations: bool = True) -> str:
    """COCO captions data into the layout coco_captions() expects
    (root/{split}/ + root/annotations/)."""
    for split in splits:
        zip_path = download_file(COCO_URLS[split], os.path.join(root, f"{split}.zip"))
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(root)
        os.remove(zip_path)
    if annotations:
        zip_path = download_file(COCO_URLS["annotations"],
                                 os.path.join(root, "annotations.zip"))
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(root)
        os.remove(zip_path)
    return root


def cc12m_shard_urls(start: int = 0, end: int = CC12M_NUM_SHARDS - 1) -> list[str]:
    """HF-hub webdataset shard URLs (cc12m.py:40-51). Feed to download_file with an HF
    token, or point WdsReader at local mirrors of these."""
    return [CC12M_WDS_URL.format(idx=i) for i in range(start, end + 1)]


def download_cc12m_shards(root: str, start: int, end: int, token: str | None = None) -> list[str]:
    token = token or os.environ.get("HF_TOKEN")
    out = []
    for url in cc12m_shard_urls(start, end):
        dest = os.path.join(root, os.path.basename(url))
        out.append(download_file(url, dest, token=token))
        log.info("downloaded %s", dest)
    return out


def download_from_google(file_id: str, dest: str, chunk_size: int = 1 << 20) -> str:
    """Google-Drive large-file download handling the virus-scan confirm flow
    (download_from_google.py:10-120): first request returns either the file, a cookie
    token, or an HTML form whose fields must be echoed back to the usercontent endpoint."""
    requests = _requests()
    session = requests.Session()
    url = "https://docs.google.com/uc?export=download"
    r = session.get(url, params={"id": file_id}, stream=True, timeout=60)

    def token_from_cookies():
        for k, v in session.cookies.items():
            if k.startswith("download_warning"):
                return {"confirm": v}
        return None

    params = {"id": file_id}
    extra = token_from_cookies()
    if extra is None and "text/html" in r.headers.get("content-type", ""):
        # new-style interstitial: parse the form inputs (uuid/confirm/at)
        import re

        html = r.text
        form_url = re.search(r'action="([^"]+)"', html)
        url = form_url.group(1) if form_url else "https://drive.usercontent.google.com/download"
        extra = dict(re.findall(r'name="([^"]+)"\s+value="([^"]*)"', html))
    if extra:
        params.update(extra)
        r = session.get(url, params=params, stream=True, timeout=60)
    r.raise_for_status()

    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    tmp = dest + ".part"
    with open(tmp, "wb") as f:
        for chunk in r.iter_content(chunk_size):
            if chunk:
                f.write(chunk)
    os.replace(tmp, dest)
    return dest


def download_laion_subset(root: str, num_samples: int = 1000,
                          dataset: str = "laion/relaion400m") -> str:
    """Materialize a LAION subset into laion_items()'s layout (root/images/{i}.jpg +
    root/captions.json) — the semantics of Datasets/laion.py:80-128, via HF datasets
    streaming."""
    from datasets import load_dataset  # HF datasets (lazy: not in the TPU image)

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    captions = []
    stream = load_dataset(dataset, split="train", streaming=True)
    requests = _requests()
    i = 0
    for sample in stream:
        if i >= num_samples:
            break
        try:
            r = requests.get(sample["url"], timeout=10)
            r.raise_for_status()
            with open(os.path.join(root, "images", f"{i}.jpg"), "wb") as f:
                f.write(r.content)
            captions.append(sample.get("caption", ""))
            i += 1
        except Exception:  # noqa: BLE001 - dead links are the norm in LAION
            continue
    with open(os.path.join(root, "captions.json"), "w") as f:
        json.dump(captions, f)
    return root
