"""Generate the config/ and config_CVPR/ YAML trees.

The hyperparameter values are the published paper-reproduction settings
captured from the reference's config trees (reference: config/,
config_CVPR/, README.md:184-186); the generation and layout are this repo's.
Run from the repo root: python tools/gen_configs.py
"""

from __future__ import annotations

import os

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write(path, params, key="parameters"):
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        yaml.safe_dump({key: params}, f, sort_keys=False)


MEM_TAGS = {"02k": 200, "05k": 500, "1k": 1000, "2k": 2000, "5k": 5000, "10k": 10000}
TUNE_GRID = {
    "learning_rate": [0.0001, 0.0003, 0.001, 0.003, 0.01, 0.03, 0.1],
    "weight_decay": [0.0001, 0.001, 0.01, 0.1],
}


def main():
    # ---------------------------------------------------------------- config/
    write("config/global.yml", {"tables": "tables/", "result": "result/"}, key="path")
    general = {
        "num_runs": 5, "seed": 0, "optimizer": "SGD", "epoch": 1, "batch": 10,
        "test_batch": 128, "val_size": 0.0, "num_val": 2, "num_runs_val": 3,
        "fix_order": False, "plot_sample": False, "online": True,
    }
    write("config/general.yml", dict(general, num_runs=1))
    write("config/general_1.yml", general)

    data_tasks = {"cifar10": 5, "cifar100": 20, "mini_imagenet": 10,
                  "core50": 9, "openloris": 9, "synthetic": 5}
    ns_factors = {
        "noise": [0.0, 0.4, 0.8, 1.2, 1.6, 2.0, 2.4, 2.8, 3.2, 3.6],
        "occlusion": [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9],
        "blur": [0.0, 0.4, 0.8, 1.2, 1.6, 2.0, 2.4, 2.8, 3.2, 3.6],
    }
    for data, ntasks in data_tasks.items():
        write(f"config/data/{data}/{data}_nc.yml",
              {"data": data, "num_tasks": ntasks, "cl_type": "nc",
               "data_name": f"{data}_nc"})
        for ns, factors in ns_factors.items():
            write(f"config/data/{data}/{data}_{ns}.yml",
                  {"data": data, "cl_type": "ni", "ns_type": ns,
                   "ns_factor": factors, "val_size": 0.1,
                   "data_name": f"{data}_{ns}"})

    def agent_base(name, **kw):
        return dict({"agent": name}, **kw)

    for tag, mem in MEM_TAGS.items():
        write(f"config/agent/er/er_{tag}.yml",
              agent_base("ER", update="random", retrieve="random", mem_size=mem,
                         eps_mem_batch=10, model_name=f"Naive_ER_{tag}"))
        write(f"config/agent/mir/mir_{tag}.yml",
              agent_base("ER", update="random", retrieve="MIR", mem_size=mem,
                         eps_mem_batch=10, subsample=50, model_name=f"MIR_{tag}"))
        write(f"config/agent/gss/gss_{tag}.yml",
              agent_base("ER", update="GSS", retrieve="random", mem_size=mem,
                         eps_mem_batch=10, gss_batch_size=10, gss_mem_strength=10,
                         model_name=f"GSS_{tag}"))
        write(f"config/agent/aser/aser_{tag}.yml",
              agent_base("ER", update="ASER", retrieve="ASER", mem_size=mem,
                         eps_mem_batch=10, aser_type="asvm", k=5, n_smp_cls=2.0,
                         model_name=f"ASER_{tag}"))
        write(f"config/agent/agem/agem_{tag}.yml",
              agent_base("AGEM", update="random", retrieve="random", mem_size=mem,
                         eps_mem_batch=10, model_name=f"AGEM_{tag}"))
        write(f"config/agent/scr/scr_{tag}.yml",
              agent_base("SCR", update="random", retrieve="random", mem_size=mem,
                         eps_mem_batch=100, temp=0.07, head="mlp",
                         model_name=f"SCR_{tag}"))
        write(f"config/agent/gdumb/gdumb_{tag}.yml",
              agent_base("GDUMB", mem_size=mem, mem_epoch=70, clip=10.0,
                         minlr=0.0005, model_name=f"GDUMB_{tag}"))
        write(f"config/agent/icarl/icarl_{tag}.yml",
              agent_base("ICARL", update="random", retrieve="random", mem_size=mem,
                         eps_mem_batch=10, model_name=f"ICARL_{tag}"))
    write("config/agent/ewc/ewc.yml",
          agent_base("EWC", fisher_update_after=50, alpha=0.9, lambda_=100,
                     model_name="EWC"))
    write("config/agent/lwf/lwf.yml", agent_base("LWF", model_name="LWF"))
    write("config/agent/cndpm/cndpm.yml",
          agent_base("CNDPM", stm_capacity=1000, classifier_chill=0.01,
                     log_alpha=-300, model_name="CNDPM"))
    for alg in ("er", "mir", "gss", "aser", "agem", "scr", "gdumb", "icarl",
                "ewc", "lwf", "cndpm"):
        write(f"config/agent/{alg}/{alg}_tune.yml", dict(TUNE_GRID))
    write("config/agent/er/finetune.yml",
          agent_base("ER", update="random", retrieve="random", mem_size=0,
                     eps_mem_batch=0, model_name="finetune"))

    # ----------------------------------------------------- config_CVPR/
    # exact paper-reproduction hyperparameters (reference config_CVPR/,
    # README.md:184-186): lr 0.1, wd 0 everywhere; per-agent specials below.
    cvpr_general = {
        "num_runs": 10, "seed": 0, "optimizer": "SGD", "epoch": 1, "batch": 10,
        "test_batch": 128, "fix_order": True, "plot_sample": False,
        "online": True, "buffer_tracker": False, "mem_iters": 1,
        "error_analysis": False,
    }
    write("config_CVPR/general.yml", cvpr_general)
    write("config_CVPR/general_iid_online.yml", dict(cvpr_general, fix_order=False))
    write("config_CVPR/general_iid_offline.yml", dict(cvpr_general, online=False))
    write("config_CVPR/general_finetune.yml", cvpr_general)
    for data, ntasks in (("cifar10", 5), ("cifar100", 10), ("mini_imagenet", 10)):
        write(f"config_CVPR/data/{data}/{data}_nc.yml",
              {"data": data, "num_tasks": ntasks, "cl_type": "nc",
               "data_name": f"{data}_nc"})

    lr = {"learning_rate": 0.1, "weight_decay": 0}
    # ASER's n_smp_cls is dataset-specific (cifar10: 9.0, cifar100: 2.0,
    # mini_imagenet: 3.0)
    aser_smp = {"cifar10": 9.0, "cifar100": 2.0, "mini": 3.0}
    for tag, mem in MEM_TAGS.items():
        if tag == "10k":
            continue
        for ncm in ("", "_ncm"):
            trick = {"ncm_trick": True} if ncm else {}
            write(f"config_CVPR/agent/er/er_{tag}{ncm}.yml",
                  agent_base("ER", update="random", retrieve="random", mem_size=mem,
                             eps_mem_batch=10, **lr, **trick,
                             model_name=f"Naive_ER_{tag}{ncm}"))
            write(f"config_CVPR/agent/mir/mir_{tag}{ncm}.yml",
                  agent_base("ER", update="random", retrieve="MIR", mem_size=mem,
                             eps_mem_batch=10, subsample=50, **lr, **trick,
                             model_name=f"MIR_{tag}{ncm}"))
            write(f"config_CVPR/agent/gss/gss_{tag}{ncm}.yml",
                  agent_base("ER", update="GSS", retrieve="random", mem_size=mem,
                             eps_mem_batch=10, gss_batch_size=10,
                             gss_mem_strength=10, **lr, **trick,
                             model_name=f"GSS_{tag}{ncm}"))
            write(f"config_CVPR/agent/agem/agem_{tag}{ncm}.yml",
                  agent_base("AGEM", update="random", retrieve="random",
                             mem_size=mem, eps_mem_batch=10, **lr, **trick,
                             model_name=f"AGEM_{tag}{ncm}"))
            for ds, smp in aser_smp.items():
                write(f"config_CVPR/agent/aser/aser_{tag}_{ds}{ncm}.yml",
                      agent_base("ER", update="ASER", retrieve="ASER",
                                 mem_size=mem, eps_mem_batch=10,
                                 aser_type="asvm", k=3, n_smp_cls=smp, **lr,
                                 **trick, model_name=f"ASER_{tag}{ncm}"))
        write(f"config_CVPR/agent/scr/scr_{tag}.yml",
              agent_base("SCR", update="random", retrieve="random", mem_size=mem,
                         eps_mem_batch=100, temp=0.1, review_trick=True, **lr,
                         model_name=f"SCR_{tag}"))
    for ncm in ("", "_ncm"):
        trick = {"ncm_trick": True} if ncm else {}
        write(f"config_CVPR/agent/ewc/ewc{ncm}.yml",
              agent_base("EWC", fisher_update_after=50, alpha=0.9, lambda_=0,
                         **lr, **trick, model_name=f"EWC{ncm}"))
        write(f"config_CVPR/agent/lwf/lwf{ncm}.yml",
              agent_base("LWF", **lr, **trick, model_name=f"LWF{ncm}"))
    write("config_CVPR/agent/er/finetune.yml",
          agent_base("ER", update="random", retrieve="random", mem_size=0,
                     eps_mem_batch=0, **lr, model_name="finetune"))
    print("config trees written")


if __name__ == "__main__":
    main()
