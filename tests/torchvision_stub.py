"""Minimal ``torchvision`` stand-in for tests that import the reference code.

torchvision is not installed in this environment; the reference encoder only
needs ``torchvision.models.resnet18/resnet34`` (src/model/encoder.py:62-64)
and ``util.util`` imports ``torchvision.transforms`` at module scope. This
stub implements the standard ResNet BasicBlock architecture with
torchvision's exact module naming (conv1/bn1/maxpool/layer{1..4}/avgpool/fc,
blocks with conv1/bn1/conv2/bn2/downsample) so state_dict keys and forward
semantics match what checkpoints and the reference encoder expect.

Weight parity with real torchvision is irrelevant here: the e2e golden test
randomly initializes the reference net and exports whatever it got.
"""
import sys
import types

import torch
from torch import nn


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(
            inplanes, planes, 3, stride=stride, padding=1, bias=False
        )
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=1, padding=1, bias=False)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers, num_classes=1000, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self._norm_layer = norm_layer
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], stride=1)
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1.0)
                nn.init.constant_(m.bias, 0.0)

    def _make_layer(self, planes, blocks, stride):
        norm_layer = self._norm_layer
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride=stride, bias=False),
                norm_layer(planes),
            )
        layers = [
            BasicBlock(self.inplanes, planes, stride, downsample, norm_layer)
        ]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(BasicBlock(planes, planes, norm_layer=norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(pretrained=False, norm_layer=None, **kw):
    assert not pretrained, "stub torchvision has no pretrained weights"
    return ResNet([2, 2, 2, 2], norm_layer=norm_layer, **kw)


def resnet34(pretrained=False, norm_layer=None, **kw):
    assert not pretrained, "stub torchvision has no pretrained weights"
    return ResNet([3, 4, 6, 3], norm_layer=norm_layer, **kw)


def install():
    """Register the stub as ``torchvision`` (no-op if real one is present)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.resnet18 = resnet18
    models.resnet34 = resnet34
    models.ResNet = ResNet
    models.BasicBlock = BasicBlock
    transforms = types.ModuleType("torchvision.transforms")
    tv.models = models
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms
