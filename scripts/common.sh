# Shared env defaults for the workflow wrappers (reference: scripts/*/*.sh).
# Override OPENSCENE_DATA_ROOT / NAVSIM_EXP_ROOT in your shell; both default
# to local directories so the wrappers run out of the box.
: "${OPENSCENE_DATA_ROOT:=$PWD/dataset}"
: "${NAVSIM_EXP_ROOT:=$PWD/exp}"
: "${TRAIN_TEST_SPLIT:=navtest}"
export OPENSCENE_DATA_ROOT NAVSIM_EXP_ROOT TRAIN_TEST_SPLIT
