"""Experiment runner (reference experiment/run.py).

multiple_run: fresh model/opt/agent per run; online mode streams tasks through
agent.train_learner and evaluates on every task's test set after each task;
offline mode concatenates all tasks first. Prints the same metric lines as the
reference and optionally pickles {time, acc_array}.
"""

from __future__ import annotations

import os
import pickle
import time

import jax
import numpy as np

from ocl_tpu.data import continuum, prepare_test_loaders
from ocl_tpu.experiment.metrics import compute_performance
from ocl_tpu.registry import agents
from ocl_tpu.utils.io import load_yaml


def _new_agent_and_state(params, run_seed):
    agent = agents[params.agent](params)
    state = agent.init_state(jax.random.PRNGKey(run_seed))
    return agent, state


def _check_buffer_tracker(state):
    """--buffer_tracker consistency check (reference BufferClassTracker
    .check_tracker, buffer_utils.py:203-205). The reference's class-index
    cache is a host dict that can drift from the buffer; here the device
    class_counts array is recomputed from the labels and compared."""
    buf = getattr(state, "buffer", None)
    if buf is None or not hasattr(buf, "class_counts"):
        return
    from ocl_tpu.buffer.state import valid_mask

    counts = np.asarray(buf.class_counts)
    labels = np.asarray(buf.labels)
    valid = np.asarray(valid_mask(buf))
    recomputed = np.bincount(labels[valid], minlength=counts.shape[0])
    print("[buffer_tracker] total {} per-class {}".format(
        int(counts.sum()), counts.astype(int).tolist()))
    if not np.array_equal(counts.astype(int), recomputed.astype(int)):
        print("[buffer_tracker] MISMATCH recomputed {}".format(
            recomputed.tolist()))


def multiple_run(params, store=False, save_path=None):
    from ocl_tpu.config import apply_runtime_flags

    apply_runtime_flags(params)
    start = time.time()
    print("Setting up data stream")
    data_continuum = continuum(params.data, params.cl_type, params)
    print("data setup time: {}".format(time.time() - start))

    if store:
        result_path = load_yaml("config/global.yml", key="path")["result"]
        table_path = result_path + params.data
        os.makedirs(table_path, exist_ok=True)
        if not save_path:
            save_path = getattr(params, "model_name", params.agent) + "_" + \
                getattr(params, "data_name", params.data) + ".pkl"

    # crash-resume: restore (run, task, accuracies, full TrainState) if a
    # checkpoint exists (new aux subsystem; the reference's save_model has no
    # call site, SURVEY.md §5.4)
    ckpt_dir = getattr(params, "ckpt_dir", None)
    resume_meta = None
    if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "meta.pkl")):
        with open(os.path.join(ckpt_dir, "meta.pkl"), "rb") as f:
            resume_meta = pickle.load(f)
        print("resuming from checkpoint: run {} after task {}".format(
            resume_meta["run"], resume_meta["task"]))

    np.random.seed(params.seed)
    accuracy_list = ([np.array(a) for a in resume_meta["accuracy_list"]]
                     if resume_meta else [])
    start_run = resume_meta["run"] if resume_meta else 0
    for run in range(params.num_runs):
        tmp_acc = []
        run_start = time.time()
        data_continuum.new_run()
        if run < start_run:
            continue  # consumed new_run() keeps the RNG stream aligned
        agent, state = _new_agent_and_state(params, params.seed + run)
        test_loaders = prepare_test_loaders(data_continuum.test_data(), params)
        resume_task = -1
        if resume_meta and run == start_run:
            from ocl_tpu.utils.checkpoint import load_checkpoint, restore_agent_meta

            state, meta = load_checkpoint(ckpt_dir, state)
            restore_agent_meta(agent, meta["agent"])
            tmp_acc = [np.array(a) for a in meta["tmp_acc"]]
            resume_task = meta["task"]
        if params.online:
            from ocl_tpu.utils.profiling import Throughput

            tput = Throughput()
            for i, (x_train, y_train, labels) in enumerate(data_continuum):
                if i <= resume_task:
                    continue  # already trained before the checkpoint
                if params.verbose:
                    print("-----------run {} training batch {}-------------".format(run, i))
                    print("size: {}, {}".format(x_train.shape, y_train.shape))
                n_imgs = (x_train.shape[0] // params.batch) * params.batch
                with tput.measure(n_imgs):
                    state = agent.train_learner(state, x_train, y_train)
                    jax.block_until_ready(jax.tree_util.tree_leaves(state.params)[0])
                if getattr(params, "buffer_tracker", False):
                    _check_buffer_tracker(state)
                acc_array = agent.evaluate(state, test_loaders)
                tmp_acc.append(acc_array)
                if ckpt_dir:
                    from ocl_tpu.utils.checkpoint import (
                        save_checkpoint,
                        snapshot_agent_meta,
                    )

                    save_checkpoint(ckpt_dir, state, {
                        "run": run, "task": i,
                        "tmp_acc": [np.asarray(a) for a in tmp_acc],
                        "accuracy_list": [np.asarray(a) for a in accuracy_list],
                        "agent": snapshot_agent_meta(agent),
                    })
            run_end = time.time()
            print("-----------run {}-----------avg_end_acc {}-----------train time {}"
                  .format(run, np.mean(tmp_acc[-1]), run_end - run_start))
            print("-----------run {} stream throughput {:.1f} images/sec "
                  "(incl. compile)-----------".format(run, tput.images_per_sec()))
            accuracy_list.append(np.array(tmp_acc))
        else:
            xs, ys = [], []
            for x_train, y_train, labels in data_continuum:
                xs.append(x_train)
                ys.append(y_train)
            x_all = np.concatenate(xs, axis=0)
            y_all = np.concatenate(ys, axis=0)
            print("----------run {} training-------------".format(run))
            state = agent.train_learner(state, x_all, y_all)
            acc_array = agent.evaluate(state, test_loaders)
            accuracy_list.append(acc_array)

    accuracy_array = np.array(accuracy_list)
    end = time.time()
    if store:
        result = {"time": end - start, "acc_array": accuracy_array}
        with open(table_path + "/" + save_path, "wb") as f:
            pickle.dump(result, f)
    if params.online:
        avg_end_acc, avg_end_fgt, avg_acc, avg_bwtp, avg_fwt = compute_performance(accuracy_array)
        print("----------- Total {} run: {}s -----------".format(params.num_runs, end - start))
        print("----------- Avg_End_Acc {} Avg_End_Fgt {} Avg_Acc {} Avg_Bwtp {} Avg_Fwt {}-----------"
              .format(avg_end_acc, avg_end_fgt, avg_acc, avg_bwtp, avg_fwt))
        return avg_end_acc, avg_end_fgt, avg_acc, avg_bwtp, avg_fwt
    print("----------- Total {} run: {}s -----------".format(params.num_runs, end - start))
    print("avg_end_acc {}".format(np.mean(accuracy_list)))
    return np.mean(accuracy_list)
