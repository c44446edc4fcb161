"""Config-string naming, pandas txt/xlsx logs, checkpoint naming.

Re-design of reference ``utils.py:629-721``. The config→string scheme is a
de-facto API (directory and checkpoint names the benchmark dataset layout
depends on, ``data/README.md:22-28``) and is kept byte-identical. xlsx
output uses the in-tree engine-free writer (``spaa_tpu.utils.xlsx``).
"""

from __future__ import annotations

import os
import time
from os.path import abspath, join

import pandas as pd


def opt_to_string(opt) -> str:
    """Training title string (ref ``utils.py:673-675``) — keyed into
    checkpoint and result-directory names."""
    return (f'{opt["setup_name"]}_{opt["model_name"]}_{opt["loss"]}_'
            f'{opt["num_train"]}_{opt["batch_size"]}_{opt["max_iters"]}_'
            f'{opt["lr"]}_{opt["lr_drop_ratio"]}_{opt["lr_drop_rate"]}_'
            f'{opt["l2_reg"]}')


def init_log_file(log_dir: str):
    """Timestamped txt+xlsx log pair with the reference's column schema
    (ref ``utils.py:678-684``)."""
    os.makedirs(log_dir, exist_ok=True)
    stamp = time.strftime("%Y-%m-%d_%H_%M_%S", time.localtime())
    log_txt = join(log_dir, stamp + ".txt")
    log_xls = join(log_dir, stamp + ".xlsx")
    ret = pd.DataFrame(columns=["Setup", "Model", "Loss", "Num train",
                                "Batch", "Iters", "PSNR", "RMSE", "SSIM",
                                "L2", "L-inf", "dE"])
    return ret, log_txt, log_xls


def write_log_file(df: pd.DataFrame, log_txt=None, log_xls=None,
                   mode: str = "w") -> None:
    """Ref ``utils.py:687-694``. xlsx is written by the in-tree minimal
    writer (``spaa_tpu.utils.xlsx``) — no pandas Excel engine needed."""
    if log_txt is not None:
        df.to_csv(log_txt, mode=mode, index=False, float_format="%.4f")
    if log_xls is not None:
        from spaa_tpu.utils.xlsx import to_excel
        to_excel(df, log_xls, index=False)
    print(f"Log files are saved to {log_txt} and {log_xls}")


def read_log(filename: str) -> pd.DataFrame:
    """Ref ``utils.py:707-714``."""
    return pd.read_table(filename, sep=",")


def log_to_table(filename: str) -> pd.DataFrame:
    """Old whitespace-separated (CompenNet-era) log file → DataFrame
    (ref ``utils.py:697-704``)."""
    return pd.read_table(filename, sep=r"\s+")


def export_setup_info(setup_path: str, cfg) -> None:
    """Write ``setup_info.yml`` for a setup (ref ``utils.py:656-670``)."""
    from spaa_tpu.utils.config import OmegaConf
    os.makedirs(setup_path, exist_ok=True)
    OmegaConf.save(cfg, join(setup_path, "setup_info.yml"))


def checkpoint_path(checkpoint_dir: str, title: str) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    return abspath(join(checkpoint_dir, title + ".flax"))


def save_checkpoint(checkpoint_dir: str, params, title: str) -> str:
    """Serialize a params pytree (flax msgpack). Ref ``utils.py:717-721``
    (state_dict .pth keyed by the full config string)."""
    from flax import serialization
    path = checkpoint_path(checkpoint_dir, title)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"Checkpoint saved to {path}\n")
    return path


def load_checkpoint(path: str, params_template):
    """Deserialize into the structure of ``params_template``."""
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())


def resume_path(checkpoint_dir: str, title: str) -> str:
    """Crash-recovery train-state file for a run (config-string keyed like
    the final checkpoint; removed on successful completion)."""
    return checkpoint_path(checkpoint_dir, title) + ".resume.npz"


def save_train_state(path: str, params, opt_state, itr: int,
                     fingerprint: int = 0) -> None:
    """Atomic (params, optimizer state, iteration) snapshot — the
    improvement over the reference's params-only save-at-end
    (ref ``utils.py:717-721``): a killed run resumes mid-train with the
    exact Adam moments and schedule step, reproducing the uninterrupted
    trajectory. Stored as flat npz leaves; the pytree structure is
    recovered from templates on load. ``fingerprint`` identifies the
    training data + index plan so a stale snapshot (e.g. the setup was
    re-captured under the same config string) is detected and discarded
    instead of silently resuming against different data."""
    import jax
    import numpy as np
    leaves = jax.tree.leaves((params, opt_state))
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["iter"] = np.int64(itr)
    payload["fingerprint"] = np.uint64(fingerprint)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:   # file handle: savez must not append .npz
        np.savez(f, **payload)
    os.replace(tmp, path)   # never leave a torn file for the next resume


def load_train_state(path: str, params_template, opt_state_template):
    """Restore a :func:`save_train_state` snapshot into the structure of
    the given templates. Returns (params, opt_state, iter, fingerprint)."""
    import jax
    import numpy as np
    treedef = jax.tree.structure((params_template, opt_state_template))
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        itr = int(data["iter"])
        fp = int(data["fingerprint"]) if "fingerprint" in data.files else 0
    params, opt_state = jax.tree.unflatten(treedef, leaves)
    return params, opt_state, itr, fp


def print_sys_info() -> None:
    """Ref ``utils.py:629-653``, TPU edition."""
    import platform

    import jax
    print("-" * 38 + " System info " + "-" * 39)
    print("OS:", platform.platform())
    print("jax version=" + jax.__version__)
    print("devices:", jax.devices())
    print("-" * 38 + " System info " + "-" * 39)
