# Shared env defaults for the workflow wrappers (reference: scripts/*/*.sh).
# Override OPENSCENE_DATA_ROOT / NAVSIM_EXP_ROOT in your shell; both default
# to local directories so the wrappers run out of the box. TRAIN_TEST_SPLIT
# is NOT defaulted here: evaluation wrappers default it to navtest and
# training wrappers to navtrain, after sourcing this file.
: "${OPENSCENE_DATA_ROOT:=$PWD/dataset}"
: "${NAVSIM_EXP_ROOT:=$PWD/exp}"
export OPENSCENE_DATA_ROOT NAVSIM_EXP_ROOT
