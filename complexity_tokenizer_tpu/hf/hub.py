"""HuggingFace Hub client (host-only).

Python equivalent of `/root/reference/src/hub.rs`: cache layout
``<cache>/<repo--id>/<file>``, HF_TOKEN auth, tokenizer.json with
vocab.json+merges.txt fallback, and local-path resolution.  Uses urllib so
no extra dependencies are required; network failures surface as IOError.
"""

from __future__ import annotations

import json
import os
import shutil
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path

__all__ = [
    "HubConfig",
    "download_file",
    "download_tokenizer",
    "is_cached",
    "get_cache_path",
    "clear_cache",
    "clear_all_cache",
    "resolve_model_path",
    "fetch_json",
    "push_to_hub",
]


def _default_cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME")
    root = Path(base) if base else Path.home() / ".cache"
    return root / "huggingface" / "hub"


@dataclass
class HubConfig:
    endpoint: str = "https://huggingface.co"
    cache_dir: Path = field(default_factory=_default_cache_dir)
    token: str | None = field(default_factory=lambda: os.environ.get("HF_TOKEN"))
    timeout: int = 60


def _http_get(url: str, config: HubConfig) -> bytes:
    req = urllib.request.Request(url)
    if config.token:
        req.add_header("Authorization", f"Bearer {config.token}")
    try:
        with urllib.request.urlopen(req, timeout=config.timeout) as resp:
            if resp.status != 200:
                raise IOError(f"HTTP {resp.status}: {url}")
            return resp.read()
    except IOError:
        raise
    except Exception as e:  # URLError etc.
        raise IOError(str(e)) from e


def download_file(
    repo_id: str,
    filename: str,
    config: HubConfig | None = None,
    revision: str | None = None,
) -> Path:
    """Fetch one file into the cache.  Non-default revisions are cached
    under ``<file>@<revision>`` so a pinned fetch can never alias the
    default-branch copy (mod.rs:193-211 builds the URL with the revision).
    """
    config = config or HubConfig()
    rev = revision or "main"
    repo_cache = Path(config.cache_dir) / repo_id.replace("/", "--")
    repo_cache.mkdir(parents=True, exist_ok=True)
    cache_name = filename if rev == "main" else f"{filename}@{rev.replace('/', '--')}"
    file_path = repo_cache / cache_name
    if file_path.exists():
        return file_path
    url = f"{config.endpoint}/{repo_id}/resolve/{rev}/{filename}"
    data = _http_get(url, config)
    file_path.write_bytes(data)
    return file_path


def download_tokenizer(
    repo_id: str,
    config: HubConfig | None = None,
    revision: str | None = None,
) -> Path:
    config = config or HubConfig()
    try:
        return download_file(repo_id, "tokenizer.json", config, revision)
    except IOError:
        pass
    vocab_path = download_file(repo_id, "vocab.json", config, revision)
    try:
        download_file(repo_id, "merges.txt", config, revision)
    except IOError:
        pass
    return vocab_path


def is_cached(repo_id: str, filename: str, config: HubConfig | None = None) -> bool:
    config = config or HubConfig()
    return (Path(config.cache_dir) / repo_id.replace("/", "--") / filename).exists()


def get_cache_path(repo_id: str, config: HubConfig | None = None) -> Path:
    config = config or HubConfig()
    return Path(config.cache_dir) / repo_id.replace("/", "--")


def clear_cache(repo_id: str, config: HubConfig | None = None) -> None:
    path = get_cache_path(repo_id, config)
    if path.exists():
        shutil.rmtree(path)


def clear_all_cache(config: HubConfig | None = None) -> None:
    config = config or HubConfig()
    if Path(config.cache_dir).exists():
        shutil.rmtree(config.cache_dir)


def resolve_model_path(model_id: str, config: HubConfig | None = None) -> Path:
    """Local path (dir -> its tokenizer.json) or Hub download (hub.rs:156-173)."""
    local = Path(model_id)
    if local.exists():
        if local.is_dir():
            tj = local / "tokenizer.json"
            if tj.exists():
                return tj
        return local
    return download_tokenizer(model_id, config)


def fetch_json(
    repo_id: str,
    filename: str,
    config: HubConfig | None = None,
    revision: str | None = None,
):
    """Fetch + parse a JSON file from the Hub; None on failure."""
    try:
        path = download_file(repo_id, filename, config, revision)
        return json.loads(path.read_text())
    except (IOError, json.JSONDecodeError):
        return None


def push_to_hub(
    save_dir: Path,
    repo_id: str,
    token: str | None = None,
    private: bool = False,
    endpoint: str = "https://huggingface.co",
) -> str:
    """Upload tokenizer artifacts (bindings/tokenizer.rs:502-564 semantics)."""
    auth = token or os.environ.get("HF_TOKEN")
    if not auth:
        raise ValueError(
            "No token provided. Set HF_TOKEN environment variable or pass token parameter."
        )
    create_req = urllib.request.Request(
        f"{endpoint}/api/repos/create",
        data=json.dumps({"type": "model", "name": repo_id, "private": private}).encode(),
        headers={
            "Authorization": f"Bearer {auth}",
            "Content-Type": "application/json",
        },
        method="POST",
    )
    try:
        urllib.request.urlopen(create_req, timeout=60)
    except Exception as e:
        msg = str(e)
        if "409" not in msg and "already exists" not in msg:
            import sys

            print(f"Warning creating repo: {msg}", file=sys.stderr)
    for filename in ("tokenizer.json", "tokenizer_config.json", "special_tokens_map.json"):
        fp = Path(save_dir) / filename
        if not fp.exists():
            continue
        upload_req = urllib.request.Request(
            f"{endpoint}/api/{repo_id}/upload/main/{filename}",
            data=fp.read_bytes(),
            headers={
                "Authorization": f"Bearer {auth}",
                "Content-Type": "application/json",
            },
            method="PUT",
        )
        try:
            urllib.request.urlopen(upload_req, timeout=60)
        except Exception as e:
            raise IOError(f"Failed to upload {filename}: {e}") from e
    return f"{endpoint}/{repo_id}"
