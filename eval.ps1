# Windows runner over the dataset enum (reference eval.ps1 analogue).
#   powershell -File eval.ps1 -WorkDir work_dirs\all
param(
    [string]$WorkDir = "work_dirs/all",
    [string]$SaveSegDir = "",
    [string]$SaveHeatmapDir = "",
    [string]$Checkpoint = ""
)

$configs = @(
    "configs/cfg_openearthmap.py", "configs/cfg_loveda.py", "configs/cfg_isaid.py",
    "configs/cfg_potsdam.py", "configs/cfg_vaihingen.py", "configs/cfg_uavid.py",
    "configs/cfg_udd5.py", "configs/cfg_vdd.py", "configs/cfg_whu_building.py",
    "configs/cfg_whu_sat_II.py", "configs/cfg_inria.py", "configs/cfg_xbd.py",
    "configs/cfg_chn6-cug.py", "configs/cfg_deepglobe_road.py",
    "configs/cfg_massachusetts_road.py", "configs/cfg_spacenet_road.py",
    "configs/cfg_wbs-si.py"
)

foreach ($config in $configs) {
    Write-Host "Running $config"
    $args = @("eval.py", "--config", $config, "--work-dir", $WorkDir)
    if ($SaveSegDir -ne "") { $args += @("--save-seg-dir", $SaveSegDir) }
    if ($SaveHeatmapDir -ne "") { $args += @("--save-heatmap-dir", $SaveHeatmapDir) }
    if ($Checkpoint -ne "") { $args += @("--checkpoint", $Checkpoint) }
    python @args
}
