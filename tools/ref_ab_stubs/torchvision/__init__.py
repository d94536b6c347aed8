"""torchvision stand-in for the reference A/B harness (torchvision is not
installed in this environment).

Two tiers:
  * label-only (imageless) reference drivers only IMPORT torchvision —
    any attribute they don't touch at runtime resolves via `_Namespace`.
  * the `--use_CNN --debug` joint A/B EXECUTES `transforms.*` and
    `models.resnet18`, so those are real implementations: the transforms
    reproduce torchvision semantics over PIL (Resize = bilinear on (h, w),
    ToTensor = float32 [0,1] CHW), and `resnet18` is the standard
    BasicBlock [2,2,2,2] ResNet in plain torch with torchvision's init
    (kaiming fan_out convs, unit BN). `pretrained=True` is accepted but
    trains from random init — this machine has no network egress and no
    weight files; the A/B runs BOTH sides from random init, so the
    comparison stays apples-to-apples.
"""

import random

import numpy as np
import torch
import torch.nn as nn
from PIL import Image


class _AnyCallable:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        raise RuntimeError(
            "torchvision stub invoked at runtime — only transforms.* and "
            "models.resnet18 are implemented for the use_CNN A/B")


class _Namespace:
    def __getattr__(self, name):
        return _AnyCallable


datasets = _Namespace()
__version__ = "0.2.2-stub"


# ---------------------------------------------------------------- transforms
class Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


class ToPILImage:
    def __call__(self, x):
        if isinstance(x, Image.Image):
            return x
        if isinstance(x, torch.Tensor):
            x = x.numpy()
        x = np.asarray(x)
        if x.dtype != np.uint8:
            x = np.clip(x, 0, 255).astype(np.uint8)
        return Image.fromarray(x)


class Resize:
    """torchvision Resize((h, w)): bilinear; PIL.resize takes (w, h)."""

    def __init__(self, size):
        self.size = size if isinstance(size, (tuple, list)) else (size, size)

    def __call__(self, img):
        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class RandomCrop:
    """torchvision RandomCrop((h, w)), no padding: uniform top-left
    (the classifier train transform, ethec_experiments.py:263-265)."""

    def __init__(self, size):
        self.size = size if isinstance(size, (tuple, list)) else (size, size)

    def __call__(self, img):
        th, tw = self.size
        w, h = img.size
        if (h, w) == (th, tw):
            return img
        top = random.randint(0, h - th)
        left = random.randint(0, w - tw)
        return img.crop((left, top, left + tw, top + th))


class _Transforms:
    Compose = Compose
    ToPILImage = ToPILImage
    Resize = Resize
    RandomHorizontalFlip = RandomHorizontalFlip
    ToTensor = ToTensor
    RandomCrop = RandomCrop

    def __getattr__(self, name):
        return _AnyCallable


transforms = _Transforms()


# -------------------------------------------------------------------- models
class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
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


class _ResNet(nn.Module):
    def __init__(self, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        layers = [_BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(_BasicBlock(planes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def _resnet18(pretrained=False, **kw):
    if pretrained:
        print("[torchvision stub] pretrained=True requested but no weights "
              "are available offline — resnet18 starts from random init")
    return _ResNet([2, 2, 2, 2], **kw)


class _Models:
    @staticmethod
    def resnet18(pretrained=False, **kw):
        return _resnet18(pretrained, **kw)

    def __getattr__(self, name):
        return _AnyCallable


models = _Models()
