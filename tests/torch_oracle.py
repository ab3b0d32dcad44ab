"""torch-cpu oracle models for numerical parity testing.

These re-state the ERFNet block math from SURVEY.md (§2a rows 1-2) in torch
so the JAX/TPU implementation can be cross-checked without the reference
repo (whose mount is empty).  Test-only — never imported by the framework.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class DownsamplerBlock(nn.Module):
    def __init__(self, ninput, noutput):
        super().__init__()
        self.conv = nn.Conv2d(ninput, noutput - ninput, (3, 3), stride=2,
                              padding=1, bias=True)
        self.pool = nn.MaxPool2d(2, stride=2)
        self.bn = nn.BatchNorm2d(noutput, eps=1e-3)

    def forward(self, x):
        out = torch.cat([self.conv(x), self.pool(x)], 1)
        out = self.bn(out)
        return F.relu(out)


class NonBottleneck1d(nn.Module):
    def __init__(self, chann, dropprob, dilated):
        super().__init__()
        self.conv3x1_1 = nn.Conv2d(chann, chann, (3, 1), stride=1,
                                   padding=(1, 0), bias=True)
        self.conv1x3_1 = nn.Conv2d(chann, chann, (1, 3), stride=1,
                                   padding=(0, 1), bias=True)
        self.bn1 = nn.BatchNorm2d(chann, eps=1e-3)
        self.conv3x1_2 = nn.Conv2d(chann, chann, (3, 1), stride=1,
                                   padding=(dilated, 0), bias=True,
                                   dilation=(dilated, 1))
        self.conv1x3_2 = nn.Conv2d(chann, chann, (1, 3), stride=1,
                                   padding=(0, dilated), bias=True,
                                   dilation=(1, dilated))
        self.bn2 = nn.BatchNorm2d(chann, eps=1e-3)
        self.dropout = nn.Dropout2d(dropprob)

    def forward(self, x):
        out = F.relu(self.conv3x1_1(x))
        out = self.conv1x3_1(out)
        out = F.relu(self.bn1(out))
        out = F.relu(self.conv3x1_2(out))
        out = self.conv1x3_2(out)
        out = self.bn2(out)
        if self.dropout.p != 0:
            out = self.dropout(out)
        return F.relu(out + x)


class UpsamplerBlock(nn.Module):
    def __init__(self, ninput, noutput):
        super().__init__()
        self.conv = nn.ConvTranspose2d(ninput, noutput, 3, stride=2,
                                       padding=1, output_padding=1, bias=True)
        self.bn = nn.BatchNorm2d(noutput, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class Encoder(nn.Module):
    def __init__(self, num_classes, dropout_1=0.03, dropout_2=0.3):
        super().__init__()
        self.initial_block = DownsamplerBlock(3, 16)
        self.layers = nn.ModuleList()
        self.layers.append(DownsamplerBlock(16, 64))
        for _ in range(5):
            self.layers.append(NonBottleneck1d(64, dropout_1, 1))
        self.layers.append(DownsamplerBlock(64, 128))
        for _ in range(2):
            for d in (2, 4, 8, 16):
                self.layers.append(NonBottleneck1d(128, dropout_2, d))
        if num_classes:
            self.output_conv = nn.Conv2d(128, num_classes, 1, stride=1,
                                         padding=0, bias=True)

    def forward(self, x, predict=False):
        out = self.initial_block(x)
        for layer in self.layers:
            out = layer(out)
        if predict:
            out = self.output_conv(out)
        return out


class Decoder(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.layers = nn.ModuleList([
            UpsamplerBlock(128, 64),
            NonBottleneck1d(64, 0, 1),
            NonBottleneck1d(64, 0, 1),
            UpsamplerBlock(64, 16),
            NonBottleneck1d(16, 0, 1),
            NonBottleneck1d(16, 0, 1),
        ])
        self.output_conv = nn.ConvTranspose2d(16, num_classes, 2, stride=2,
                                              padding=0, output_padding=0,
                                              bias=True)

    def forward(self, x):
        out = x
        for layer in self.layers:
            out = layer(out)
        return self.output_conv(out)


class Net(nn.Module):
    def __init__(self, num_classes, encoder=None):
        super().__init__()
        self.encoder = Encoder(num_classes) if encoder is None else encoder
        self.decoder = Decoder(num_classes)

    def forward(self, x, only_encode=False):
        if only_encode:
            return self.encoder(x, predict=True)
        return self.decoder(self.encoder(x, predict=False))


class ERFNetImageNet(nn.Module):
    """imagenet/erfnet_imagenet.py equivalent: Features + Linear head."""

    def __init__(self, num_classes=1000):
        super().__init__()

        class Features(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = Encoder(num_classes=0, dropout_1=0.1,
                                       dropout_2=0.1)
                self.extralayer1 = nn.MaxPool2d(2, stride=2)
                self.extralayer2 = nn.AvgPool2d(14, 1, 0)

            def forward(self, x):
                x = self.encoder(x, predict=False)
                x = self.extralayer1(x)
                x = self.extralayer2(x)
                return x

        self.features = Features()
        self.classifier = nn.Linear(128, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = x.view(x.size(0), -1)
        return self.classifier(x)


# ---------------------------------------------------------------------------
# torch <-> jax weight transfer helpers (test-side mirror of the importer)
# ---------------------------------------------------------------------------

def conv_w_to_jax(w):
    """torch Conv2d weight (O, I, kh, kw) -> HWIO."""
    return w.detach().numpy().transpose(2, 3, 1, 0)


def convT_w_to_jax(w):
    """torch ConvTranspose2d weight (I, O, kh, kw) -> forward-conv HWIO,
    spatially flipped."""
    return w.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
