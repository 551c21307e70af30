#!/usr/bin/env bash
# Fetch datasets into ./datasets/ in the raw formats the loaders read
# (reference fetch_data_setup.sh downloads the same artifacts).
set -euo pipefail
mkdir -p datasets && cd datasets

# CIFAR-10 / CIFAR-100 (python pickle batches)
mkdir -p cifar10 cifar100
wget -nc https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz
tar -xzf cifar-10-python.tar.gz -C cifar10
wget -nc https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz
tar -xzf cifar-100-python.tar.gz -C cifar100

# CORe50 128x128 + paths/LUP/labels pickles
mkdir -p core50 && cd core50
wget -nc http://bias.csr.unibo.it/maltoni/download/core50/core50_128x128.zip
unzip -n core50_128x128.zip
wget -nc https://vlomonaco.github.io/core50/data/paths.pkl
wget -nc https://vlomonaco.github.io/core50/data/LUP.pkl
wget -nc https://vlomonaco.github.io/core50/data/labels.pkl
cd ..

# Mini-ImageNet: place the kaggle cache pickles
#   mini-imagenet-cache-{train,val,test}.pkl  ->  datasets/mini_imagenet/
# OpenLORIS: place the per-factor jpg tree    ->  datasets/openloris/<factor>/
echo "done (mini_imagenet and openloris require manual placement; see comments)"
