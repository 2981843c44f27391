"""Shared helpers for integration tests: tiny configs + synthetic data."""

import copy

NORM = {"mean": [0.4914, 0.4822, 0.4465], "std": [0.2470, 0.2435, 0.2616]}


def train_t():
    return {
        "color_jitter": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4,
                         "hue": 0.1, "apply_prob": 0.8},
        "random_gray": {"p": 0.2},
        "random_resized_crop": {"size": [32, 32], "scale": [0.2, 1.0]},
        "random_flip": None,
        "to_tensor": None,
        "normalize": copy.deepcopy(NORM),
    }


def test_t():
    return {"center_crop": {"size": [32, 32]}, "to_tensor": None,
            "normalize": copy.deepcopy(NORM)}


def mini_config(algo: str, epochs=1, batch_size=16):
    data = {"dataset_name": "cifar10", "root": "/tmp/nonexistent-data",
            "batch_size": batch_size,
            "transforms": {"train": train_t(), "test": test_t()}}
    cfg = {
        "epochs": epochs, "eval_every": 1,
        "data": data,
        "encoder": {"reduce_bottom_conv": True},
        "optimizer": {"name": "sgd", "lr": 0.1, "momentum": 0.9,
                      "nesterov": True, "weight_decay": 1e-4},
        "scheduler": {"name": "cosine", "warmup_epochs": 0},
        "linear_eval": {"epochs": 2, "input_dim": 16, "batch_size": 16, "lr": 0.1},
        "wandb": {"project": None},
    }
    extras = {
        "simclr": {"proj_dim": 16, "loss_fn": {"normalize": True, "temperature": 0.5}},
        "moco": {"proj_dim": 16, "queue_size": 64, "momentum": 0.99,
                 "loss_fn": {"normalize": True, "temperature": 0.07}},
        "byol": {"proj_dim": 16, "tau": 0.99},
        "relic": {"proj_dim": 16, "tau": 0.99,
                  "loss_fn": {"normalize": True, "temperature": 1.0, "alpha": 0.5}},
        "simsiam": {"proj_dim": 32, "bottleneck_dim": 8},
        "barlow": {"proj_dim": 32,
                   "loss_fn": {"normalize": False, "off_diagonal_weight": 0.005}},
        "swav": {"hidden_dim": 32, "proj_dim": 16, "prototype_size": 40,
                 "feature_bank_size": 48,
                 "loss_fn": {"temperature": 0.1, "sinkhorn_eps": 0.05,
                             "sinkhorn_iters": 3}},
        "pirl": {"proj_dim": 16, "patch_size": 16, "num_patches": 4,
                 "num_negatives": 24, "momentum": 0.5,
                 "loss_fn": {"normalize": True, "temperature": 0.07,
                             "loss_weight": 0.5}},
        "deep_cluster": {"num_classes": 4, "kmeans": {"n_iters": 10, "n_redo": 2}},
        "sela": {"num_clusters": 8, "num_cluster_heads": 3, "lambda": 25,
                 "self_label_iters": 5},
        "dino": {},
    }
    cfg.update(extras[algo])
    if algo == "sela":
        cfg["data"]["transforms"] = {"aug": train_t(), "std": test_t()}
    if algo == "dino":
        cfg.update({
            "eval_every": 1,
            "teacher_temp_lower": 0.04, "teacher_temp_upper": 0.07,
            "student_temp": 0.1, "center_momentum": 0.9,
            "weight_decay_upper": 0.4, "weight_decay_lower": 0.04,
            "lambda_upper": 1.0, "lambda_lower": 0.99, "gradient_clip": 3.0,
            "proj_head": {"hidden_dim": 24, "proj_dim": 16},
            "optimizer": {"name": "adamw", "lr": 1e-4, "epsilon": 1e-6,
                          "weight_decay": 0.04},
            "encoder": {"hidden_dim": 32, "embedding_dim": 16,
                        "intermediate_dim": 48, "num_attention_heads": 4,
                        "patch_size": 4, "num_local_patches": 4,
                        "num_global_patches": 64, "num_encoder_layers": 2},
        })
        cfg["data"] = {"dataset_name": "cifar10", "root": "/tmp/nonexistent-data",
                       "batch_size": 8,
                       "multicrop_config": {
                           "num_local_views": 2, "num_global_views": 2,
                           "global_size": [32, 32], "local_size": [8, 8],
                           "scale_threshold": 0.3,
                           "train_transforms": train_t(),
                           "test_transforms": test_t()}}
        cfg["linear_eval"] = {"epochs": 2, "input_dim": 16, "batch_size": 16,
                              "lr": 0.1}
    return cfg


def make_trainer(algo: str, tmp_path, arch="tiny", epochs=1, batch_size=16,
                 n_train=64, n_test=32, cfg_extra=None, **trainer_kw):
    import yaml
    from ssv_tpu.train import Trainer

    cfg = mini_config(algo, epochs=epochs, batch_size=batch_size)
    if cfg_extra:
        cfg.update(cfg_extra)
    cfg_path = tmp_path / f"{algo}.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f, sort_keys=False)
    import os
    os.chdir(tmp_path)  # outputs/ under tmp
    args = {"config": str(cfg_path), "algo": algo, "arch": arch,
            "task": "train", "output": "testrun", "load": None}
    return Trainer(args, synthetic_sizes=(n_train, n_test), **trainer_kw)
