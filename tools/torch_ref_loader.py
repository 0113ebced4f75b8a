"""Load the reference's torch network modules for use as parity oracles.

The reference imports ``torchvision.models.resnet18`` (networks/revresnet.py:6,
used with pretrained=True at networks/uresnet.py:16); torchvision is not in
this image, so a structurally identical stub resnet18 is installed (standard
BasicBlock ResNet-18 with torchvision attribute/state_dict naming:
conv1, bn1, layer{1..4}.{0,1}.conv{1,2}/bn{1,2}/downsample, avgpool, fc).
``pretrained`` is accepted and ignored -- parity tests randomize weights.

Only used by tests/tools on the host; never on the TPU path.
"""

from __future__ import annotations

import sys
import types

_REFERENCE_ROOT = "/root/reference"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet18(nn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, 2, 1)
            self.layer2 = self._make_layer(128, 2, 2)
            self.layer3 = self._make_layer(256, 2, 2)
            self.layer4 = self._make_layer(512, 2, 2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, num_classes)

        def _make_layer(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))
            layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            layers += [BasicBlock(planes, planes) for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def resnet18(pretrained=False, **kwargs):   # noqa: ARG001 (stub)
        return ResNet18(**kwargs)

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet18 = resnet18
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


def load_reference_networks():
    """Returns the reference ``networks`` package (networks.py, uresnet.py,
    revresnet.py) with the torchvision stub installed."""
    _install_torchvision_stub()
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    import networks.networks as ref_networks
    import networks.revresnet as ref_revresnet
    import networks.uresnet as ref_uresnet
    return ref_networks, ref_uresnet, ref_revresnet
