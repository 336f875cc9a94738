"""Model registry — EP2 semantics (SURVEY.md §3).

The reference manages ONNX embedding models as DB catalog objects:
- load:   DBMS_VECTOR.LOAD_ONNX_MODEL(directory, file_name, model_name)
          (load_models.py:88-101)
- list:   SELECT MODEL_NAME FROM USER_MINING_MODELS (load_models.py:55-59)
- drop:   DBMS_VECTOR.DROP_ONNX_MODEL(name, force=>TRUE) (drop_models.py:62-69)
- orphans: loaded_models - config_db_names (drop_models.py:120-126)
- registry metadata: models.json (id, name, description, url, output file,
  db_model_name) (models.json:2-11)

Spark-native equivalent: a JSON manifest + model files under a warehouse
directory. Executors pull model bytes lazily on first UDF call (the embed
provider reads ``file_path``); nothing here touches the JVM.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass
from datetime import datetime, timezone


@dataclass
class ModelEntry:
    model_name: str
    model_id: str | None = None
    description: str | None = None
    file_path: str | None = None
    dim: int | None = None
    loaded_at: str | None = None


class ModelRegistry:
    """File-backed model manifest with load/list/drop/force/orphan semantics."""

    def __init__(self, warehouse_dir: str):
        self.warehouse_dir = warehouse_dir
        self.manifest_path = os.path.join(warehouse_dir, "models_manifest.json")
        os.makedirs(warehouse_dir, exist_ok=True)

    def _read(self) -> dict[str, dict]:
        if not os.path.exists(self.manifest_path):
            return {}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write(self, manifest: dict[str, dict]) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic manifest swap

    def list_models(self) -> list[str]:
        """Analog of USER_MINING_MODELS (load_models.py:55-59)."""
        return sorted(self._read().keys())

    def is_loaded(self, model_name: str) -> bool:
        return model_name in self._read()

    def load(
        self,
        model_name: str,
        file_path: str,
        model_id: str | None = None,
        description: str | None = None,
        dim: int | None = None,
        force: bool = False,
    ) -> bool:
        """Copy model file into the warehouse + upsert manifest row.

        Returns False (skip) when already loaded and not ``force`` —
        mirroring load_models.py:161-167.
        """
        manifest = self._read()
        if model_name in manifest and not force:
            return False
        dest = os.path.join(self.warehouse_dir, os.path.basename(file_path))
        if os.path.abspath(file_path) != os.path.abspath(dest):
            shutil.copyfile(file_path, dest)
        manifest[model_name] = asdict(
            ModelEntry(
                model_name=model_name,
                model_id=model_id,
                description=description,
                file_path=dest,
                dim=dim,
                loaded_at=datetime.now(timezone.utc).isoformat(),
            )
        )
        self._write(manifest)
        return True

    def drop(self, model_name: str, force: bool = False) -> bool:
        """Remove manifest row + model file (drop_models.py:62-69).

        Without ``force``, refuses to drop a model another entry still
        points at (shared file)."""
        manifest = self._read()
        entry = manifest.pop(model_name, None)
        if entry is None:
            return False
        path = entry.get("file_path")
        shared = any(e.get("file_path") == path for e in manifest.values())
        if path and os.path.exists(path) and (force or not shared):
            os.unlink(path)
        self._write(manifest)
        return True

    def orphans(self, configured_names: set[str]) -> list[str]:
        """loaded - configured, the drop_models.py:120-126 anti-join."""
        return sorted(set(self._read().keys()) - set(configured_names))

    def get(self, model_name: str) -> ModelEntry | None:
        e = self._read().get(model_name)
        return ModelEntry(**e) if e else None


def download_model(url: str, dest_dir: str, extract_suffix: str = ".onnx") -> list[str]:
    """S10: fetch a model archive and extract matching members — the
    download_models.py:18-49 pattern (urllib fetch, zipfile extract of
    ``*.onnx`` members; plain files are copied through). Driver-side
    utility; returns the extracted file paths. ``file://`` URLs work for
    air-gapped/warehouse sources (and tests)."""
    import urllib.request
    import zipfile

    os.makedirs(dest_dir, exist_ok=True)
    name = os.path.basename(url.rstrip("/")) or "model.bin"
    tmp = os.path.join(dest_dir, name + ".part")
    urllib.request.urlretrieve(url, tmp)

    out: list[str] = []
    if zipfile.is_zipfile(tmp):
        with zipfile.ZipFile(tmp) as zf:
            for member in zf.namelist():
                if member.endswith(extract_suffix):
                    # flatten archive paths; never allow traversal outside dest
                    target = os.path.join(dest_dir, os.path.basename(member))
                    with zf.open(member) as src, open(target, "wb") as dst:
                        shutil.copyfileobj(src, dst)
                    out.append(target)
        os.unlink(tmp)
    else:
        final = os.path.join(dest_dir, name)
        os.replace(tmp, final)
        out.append(final)
    return sorted(out)
