"""Config-string naming, pandas txt/xlsx logs, checkpoint naming.

Re-design of reference ``utils.py:629-721``. The config→string scheme is a
de-facto API (directory and checkpoint names the benchmark dataset layout
depends on, ``data/README.md:22-28``) and is kept byte-identical. xlsx
output degrades gracefully to csv when no engine is installed.
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
    """Ref ``utils.py:687-694``; xlsx skipped if no engine available."""
    if log_txt is not None:
        df.to_csv(log_txt, mode=mode, index=False, float_format="%.4f")
    if log_xls is not None:
        try:
            df.to_excel(log_xls, index=False, float_format="%.4f")
        except (ImportError, ModuleNotFoundError, ValueError):
            pass  # no xlsx engine in this image; the .txt log is canonical
    print(f"Log files are saved to {log_txt} and {log_xls}")


def read_log(filename: str) -> pd.DataFrame:
    """Ref ``utils.py:707-714``."""
    return pd.read_table(filename, sep=",")


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


def print_sys_info() -> None:
    """Ref ``utils.py:629-653``, TPU edition."""
    import platform

    import jax
    print("-" * 38 + " System info " + "-" * 39)
    print("OS:", platform.platform())
    print("jax version=" + jax.__version__)
    print("devices:", jax.devices())
    print("-" * 38 + " System info " + "-" * 39)
