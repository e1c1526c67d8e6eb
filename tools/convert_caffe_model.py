#!/usr/bin/env python
"""Caffe(1) caffemodel -> Detectron-style pkl, keeping BatchNorm.

Rebuild of /root/reference/tools/pickle_caffe_blobs_keep_bn.py without any
caffe/caffe2 dependency: the caffemodel's NetParameter is read with a
minimal protobuf wire-format parser (only the fields the weights need), so
the tool runs anywhere.  Output blob naming matches the reference:

  conv 'res4b11_branch2c'          -> res4_11_branch2c_w / _b
  BatchNorm 'bn2a_branch2a' +
  Scale     'scale2a_branch2a'     -> res2_0_branch2a_bn_{rm,riv,s,b}
  stem 'bn_conv1'/'scale_conv1'    -> res_conv1_bn_{rm,riv,s,b}
  (reference :75-88 name normalization, :112-159 BN extraction)

BatchNorm moving averages are divided by the stored scale factor
(blobs[2]) when present — the Caffe convention; the known MSRA ResNet
models carry factor 1.0, where this is identical to the reference's raw
read.

  python tools/convert_caffe_model.py ResNet-50-model.caffemodel R-50_BN.pkl
"""

import argparse
import struct
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


# --------------------------------------------------------------------------
# minimal protobuf wire parser
# --------------------------------------------------------------------------

def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf, start=0, end=None):
    """Yields (field_number, wire_type, value_bytes_or_int)."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:                       # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:                     # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:                     # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:                     # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError('unsupported wire type {}'.format(wt))
        yield field, wt, val


def _parse_blob(buf):
    """BlobProto: num/channels/height/width=1..4, data=5 (packed float),
    shape=7 (BlobShape.dim=1)."""
    dims_old = {}
    shape = []
    data_chunks = []
    for field, wt, val in iter_fields(buf):
        if field in (1, 2, 3, 4) and wt == 0:
            dims_old[field] = val
        elif field == 5:
            if wt == 2:  # packed floats
                data_chunks.append(np.frombuffer(val, dtype='<f4'))
            else:        # unpacked single float
                data_chunks.append(
                    np.frombuffer(bytes(val), dtype='<f4'))
        elif field == 7 and wt == 2:
            for f2, w2, v2 in iter_fields(val):
                if f2 == 1:
                    if w2 == 0:
                        shape.append(v2)
                    elif w2 == 2:  # packed int64
                        pos = 0
                        while pos < len(v2):
                            d, pos = _read_varint(v2, pos)
                            shape.append(d)
    data = np.concatenate(data_chunks) if data_chunks else np.zeros(0, 'f4')
    if not shape and dims_old:
        shape = [dims_old.get(i, 1) for i in (1, 2, 3, 4)]
    return np.asarray(shape, np.int64), data


_V1_TYPE_NAMES = {4: 'Convolution', 14: 'InnerProduct'}  # V1 enum subset


def _parse_layer(buf, v1=False):
    """LayerParameter: name=1, type=2(str), blobs=7.
    V1LayerParameter: name=4, type=5(enum), blobs=6."""
    name, ltype, blobs = '', '', []
    f_name, f_type, f_blobs = (4, 5, 6) if v1 else (1, 2, 7)
    for field, wt, val in iter_fields(buf):
        if field == f_name and wt == 2:
            name = val.decode('utf-8', 'replace')
        elif field == f_type:
            if v1 and wt == 0:
                ltype = _V1_TYPE_NAMES.get(val, 'type_{}'.format(val))
            elif wt == 2:
                ltype = val.decode('utf-8', 'replace')
        elif field == f_blobs and wt == 2:
            blobs.append(_parse_blob(val))
    return name, ltype, blobs


def parse_caffemodel(path):
    """Returns [(name, type, [(shape, data)])] for layers with weights."""
    with open(path, 'rb') as f:
        buf = f.read()
    layers = []
    for field, wt, val in iter_fields(buf):
        if field == 100 and wt == 2:      # NetParameter.layer
            layers.append(_parse_layer(val, v1=False))
        elif field == 2 and wt == 2:      # NetParameter.layers (V1)
            layers.append(_parse_layer(val, v1=True))
    return [l for l in layers if l[2]]


# --------------------------------------------------------------------------
# naming + BN folding (reference :75-88, :112-159)
# --------------------------------------------------------------------------

def normalize_resnet_name(name):
    if name.startswith('res') and '_' in name and not name.startswith('res_'):
        chunk = name[len('res'):name.find('_')]
        if len(chunk) >= 2 and chunk[0].isdigit():
            block = (int(chunk[2:]) if len(chunk) > 2
                     else ord(chunk[1]) - ord('a'))
            return 'res' + chunk[0] + '_' + str(block) + \
                name[name.find('_'):]
    return name


def convert(caffemodel_path):
    layers = parse_caffemodel(caffemodel_path)
    blobs = {}
    bn_layers = {}
    scale_layers = {}
    for name, ltype, lblobs in layers:
        if ltype == 'BatchNorm':
            bn_layers[name[len('bn'):]] = lblobs
        elif ltype == 'Scale':
            scale_layers[name[len('scale'):]] = lblobs
        elif ltype in ('Convolution', 'InnerProduct'):
            base = normalize_resnet_name(name)
            shape, data = lblobs[0]
            blobs[base + '_w'] = data.reshape(shape)
            if len(lblobs) > 1:
                bshape, bdata = lblobs[1]
                blobs[base + '_b'] = bdata.reshape(-1)
    for suffix, bn in bn_layers.items():
        assert suffix in scale_layers, \
            'BatchNorm bn{} without Scale pair'.format(suffix)
        scl = scale_layers[suffix]
        out = normalize_resnet_name('res' + suffix) + '_bn'
        mean = bn[0][1].copy()
        var = bn[1][1].copy()
        if len(bn) > 2 and bn[2][1].size and bn[2][1][0] != 0:
            factor = 1.0 / bn[2][1][0]
            mean *= factor
            var *= factor
        blobs[out + '_rm'] = mean
        blobs[out + '_riv'] = var
        blobs[out + '_s'] = scl[0][1].copy()
        blobs[out + '_b'] = scl[1][1].copy()
    return blobs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('caffemodel')
    parser.add_argument('out_pkl')
    args = parser.parse_args()
    from pps_tpu.utils.io import save_object
    blobs = convert(args.caffemodel)
    save_object(blobs, args.out_pkl)
    print('Wrote {} blobs:'.format(len(blobs)))
    print(sorted(blobs.keys()))


if __name__ == '__main__':
    main()
