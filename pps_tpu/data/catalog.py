"""Dataset catalog: name -> {image dir, annotation json}.

Mirrors the re-ID entries of the reference catalog
(/root/reference/detectron/datasets/dataset_catalog.py:205-249).  The data
root defaults to ``<repo>/datasets/data`` and can be moved with
``$PPS_TPU_DATA_DIR``.  ``register_dataset`` lets tests and converters add
entries at runtime (the reference required editing the catalog file).
"""

import os

_DATA_DIR = os.environ.get(
    'PPS_TPU_DATA_DIR',
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), 'datasets', 'data'))

_CATALOG = {}


def register_dataset(name, image_directory, annotation_file):
    _CATALOG[name] = {'im_dir': image_directory, 'ann_fn': annotation_file}


def _register_default(name, subdir):
    register_dataset(
        name + '_trainval',
        os.path.join(_DATA_DIR, subdir, 'images'),
        os.path.join(_DATA_DIR, subdir, 'trainval.json'))
    register_dataset(
        name + '_test',
        os.path.join(_DATA_DIR, subdir, 'images'),
        os.path.join(_DATA_DIR, subdir, 'test.json'))


_register_default('market1501', 'market1501')
_register_default('duke', 'duke')
_register_default('cuhk03', os.path.join('cuhk03', 'labeled'))
_register_default('cuhk03_detected', os.path.join('cuhk03', 'detected'))

# remaining reference entries (reference dataset_catalog.py:241-276):
# wanda (an internal re-ID set; same json layout) and ped_attr (consumed
# only by the attr head, which is dead in the reference — kept so the
# catalog surface matches name-for-name)
for _split in ('trainval', 'val', 'test', 'debug'):
    register_dataset(
        'wanda_' + _split,
        os.path.join(_DATA_DIR, 'wanda', 'images'),
        os.path.join(_DATA_DIR, 'wanda', _split + '.json'))
for _split in ('trainval', 'debug'):
    register_dataset(
        'ped_attr_' + _split,
        os.path.join(_DATA_DIR, 'ped_attr', 'trainval'),
        os.path.join(_DATA_DIR, 'ped_attr', _split + '.json'))


def datasets():
    """Available dataset names (reference dataset_catalog.py:datasets)."""
    return _CATALOG.keys()


def contains(name):
    return name in _CATALOG


def get_im_dir(name):
    assert name in _CATALOG, 'Unknown dataset: {}'.format(name)
    return _CATALOG[name]['im_dir']


def get_ann_fn(name):
    assert name in _CATALOG, 'Unknown dataset: {}'.format(name)
    return _CATALOG[name]['ann_fn']
