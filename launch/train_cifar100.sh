#!/bin/bash
# CIFAR-100 VGG-16 K-FAC launcher (reference train_cifar100.sh: decay at
# 35/65/80/90, otherwise the CIFAR-10 recipe with 100 classes).
model="${model:-vgg16}"
lr_decay="${lr_decay:-35 65 80 90}"
extra="${extra:-}"
export model lr_decay
exec env extra="--num-classes 100 $extra" "$(dirname "$0")/train_cifar10.sh"
